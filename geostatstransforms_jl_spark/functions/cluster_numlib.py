"""Driver-side numeric clustering primitives (no scipy in this container).

These run only on *bounded* inputs by design — the reference caps GHC at
nmax=2000 samples (src/clustering/ghc.jl:34) and GSC is O(n²) dense
(src/clustering/gsc.jl:77) — so a vectorized numpy implementation on the
driver is the faithful mapping (SURVEY.md §2 P11).
"""

from __future__ import annotations

import numpy as np


def ward_linkage(D: np.ndarray):
    """Exact Ward agglomeration on a condensed distance matrix.

    Returns the merge list [(rep_a, rep_b, height, new_size), ...] in
    monotone height order (greedy global-minimum merges, Lance-Williams
    update on squared distances — matches hclust(:ward) which squares
    non-squared input internally).

    Cluster representatives are element indices; after a merge the combined
    cluster keeps representative min(rep_a, rep_b).
    """
    n = D.shape[0]
    d2 = D.astype(np.float64) ** 2
    np.fill_diagonal(d2, np.inf)
    active = np.ones(n, dtype=bool)
    sizes = np.ones(n, dtype=np.int64)
    merges = []
    work = d2.copy()
    for _ in range(n - 1):
        flat = np.argmin(work)
        i, j = divmod(int(flat), n)
        if i > j:
            i, j = j, i
        h = np.sqrt(work[i, j])
        ni, nj = sizes[i], sizes[j]
        # Lance-Williams ward update of row i (the surviving cluster)
        nk = sizes
        with np.errstate(invalid="ignore"):
            newrow = ((ni + nk) * work[i] + (nj + nk) * work[j] - nk * work[i, j]) / (
                ni + nj + nk
            )
        work[i, :] = newrow
        work[:, i] = newrow
        work[i, i] = np.inf
        work[j, :] = np.inf
        work[:, j] = np.inf
        active[j] = False
        sizes[i] = ni + nj
        merges.append((i, j, float(h), int(sizes[i])))
    return merges


def cutree(merges, n: int, k: int) -> np.ndarray:
    """Cut the dendrogram into k clusters; labels numbered 1..k by first
    occurrence in element order (pins the reference's exact-label fixtures,
    test/clustering.jl:94-97)."""
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for (i, j, h, sz) in merges[: max(0, n - k)]:
        ri, rj = find(i), find(j)
        parent[max(ri, rj)] = min(ri, rj)
    roots = np.array([find(i) for i in range(n)])
    labels = np.zeros(n, dtype=np.int64)
    mapping = {}
    nxt = 1
    for i, r in enumerate(roots):
        if r not in mapping:
            mapping[r] = nxt
            nxt += 1
        labels[i] = mapping[r]
    return labels


def kmeans(X: np.ndarray, k: int, tol: float = 1e-4, maxiter: int = 10, seed: int = 0):
    """Deterministic Lloyd with k-means++ init (Clustering.jl's default init;
    labels 1-based like the reference)."""
    rng = np.random.default_rng(seed)
    n = X.shape[0]
    # k-means++ seeding
    centers = [X[int(rng.integers(n))]]
    for _ in range(1, k):
        d2 = np.min(
            ((X[:, None, :] - np.asarray(centers)[None, :, :]) ** 2).sum(-1), axis=1
        )
        tot = d2.sum()
        if tot <= 0:
            centers.append(X[int(rng.integers(n))])
            continue
        probs = d2 / tot
        centers.append(X[int(rng.choice(n, p=probs))])
    C = np.asarray(centers, dtype=float)
    # prev=None (not inf): `inf - obj <= tol*inf` is inf <= inf = True, which
    # silently stopped Lloyd after a single iteration
    prev = None
    labels = np.zeros(n, dtype=np.int64)
    for _ in range(maxiter):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        labels = np.argmin(d2, axis=1)
        obj = d2[np.arange(n), labels].sum()
        for c in range(k):
            m = labels == c
            if m.any():
                C[c] = X[m].mean(axis=0)
        if prev is not None and prev - obj <= tol * abs(prev):
            break
        prev = obj
    return labels + 1, C


def topk_eigvecs(L: np.ndarray, k: int) -> np.ndarray:
    """Eigenvectors of symmetric L for the k largest eigenvalues
    (the reference's partialschur/partialeigen, src/clustering/gsc.jl:90-91)."""
    vals, vecs = np.linalg.eigh(L)
    return vecs[:, np.argsort(vals)[::-1][:k]]
