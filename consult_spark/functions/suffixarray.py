"""Suffix-array construction + longest-common-substring (per candidate pair).

The exact-verification analog of CONSULT's Hamming check (hd(),
main_search.cpp:1238-1259): after LSH proposes a candidate pair, an exact
structural check confirms it.  For transcripts the check is substring
containment: the longest common substring of the two texts, found via a
suffix array over `a + SEP + b` with Kasai LCP, compared against a fraction
of the shorter text.

Doubling construction with numpy argsort — O(n log^2 n), entirely
vectorized; fine for transcripts (<= a few thousand chars each).
"""

from __future__ import annotations

import numpy as np


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of an int array (values >= 0). Returns int64[n]."""
    n = s.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.asarray(s, dtype=np.int64)
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while True:
        # composite key: (rank[i], rank[i+k] or -1)
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        sa = order.astype(np.int64)
        # re-rank
        prev_first = rank[sa[:-1]]
        prev_second = second[sa[:-1]]
        cur_first = rank[sa[1:]]
        cur_second = second[sa[1:]]
        new_group = (cur_first != prev_first) | (cur_second != prev_second)
        tmp[sa[0]] = 0
        tmp[sa[1:]] = np.cumsum(new_group)
        rank = tmp.copy()
        if rank[sa[-1]] == n - 1:
            return sa
        k <<= 1
        if k >= n:
            return sa


def lcp_array(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = LCP(sa[i], sa[i+1]). int64[n-1]."""
    n = s.shape[0]
    if n <= 1:
        return np.empty(0, dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n - 1, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r == n - 1:
            h = 0
            continue
        j = sa[r + 1]
        while i + h < n and j + h < n and s[i + h] == s[j + h]:
            h += 1
        lcp[r] = h
        if h:
            h -= 1
    return lcp


def longest_common_substring(a: str, b: str) -> int:
    """Length of the longest common substring of a and b (suffix array + LCP)."""
    if not a or not b:
        return 0
    ab = np.frombuffer(a.encode("utf-8"), dtype=np.uint8).astype(np.int64) + 2
    bb = np.frombuffer(b.encode("utf-8"), dtype=np.uint8).astype(np.int64) + 2
    sep = np.array([1], dtype=np.int64)  # below any utf-8 byte + 2
    s = np.concatenate([ab, sep, bb])
    sa = suffix_array(s)
    lcp = lcp_array(s, sa)
    na = ab.shape[0]
    # adjacent suffixes from different halves
    from_a = sa < na
    cross = from_a[:-1] != from_a[1:]
    if not cross.any():
        return 0
    return int(lcp[cross].max())


def substring_contained(a: str, b: str, min_frac: float) -> tuple[bool, int]:
    """True iff LCS(a, b) >= min_frac * min(len(a), len(b)). Returns (ok, lcs)."""
    lcs = longest_common_substring(a, b)
    m = min(len(a or ""), len(b or ""))
    if m == 0:
        return False, lcs
    return lcs >= min_frac * m, lcs
