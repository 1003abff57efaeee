from .catalog import load_table, load_media, TABLES

__all__ = ["load_table", "load_media", "TABLES"]
