from .catalog import load_table, load_media, write_zordered, TABLES

__all__ = ["load_table", "load_media", "write_zordered", "TABLES"]
