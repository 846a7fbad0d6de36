"""Lexical string-distance kernels (reference feature set F2-F8).

The reference computes these with the ``stringdist`` C library
(reference R/fuzzylink.R:174-185): Jaro-Winkler similarity (p=0.1) as the
second model feature, plus OSA / q-gram cosine / q-gram Jaccard / LCS /
q-gram / soundex distances for the random-forest learner. We implement the
same semantics in Python, applied over Arrow record batches via pandas
UDFs — one batch-level UDF computes every feature in a single pass so each
candidate pair crosses the Python boundary once.

All inputs are lowercased before measuring, exactly as the reference does
(R/fuzzylink.R:174, 180-185).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# pure-Python kernels (unit-tested; vectorized at the Arrow-batch level)
# ---------------------------------------------------------------------------


def jaro(s1: str, s2: str) -> float:
    """Jaro similarity in [0,1]."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c1:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    t = transpositions / 2
    m = matches
    return (m / len1 + m / len2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1, max_prefix: int = 4) -> float:
    """Jaro-Winkler *similarity* with prefix scale ``p`` (reference uses
    stringsim(method='jw', p=0.1) — R/fuzzylink.R:174-175)."""
    j = jaro(s1, s2)
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b or prefix >= max_prefix:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


def osa_distance(s1: str, s2: str) -> float:
    """Optimal string alignment (restricted Damerau-Levenshtein) distance
    (reference method='osa', R/fuzzylink.R:180)."""
    len1, len2 = len(s1), len(s2)
    if len1 == 0:
        return float(len2)
    if len2 == 0:
        return float(len1)
    prev2 = None
    prev = list(range(len2 + 1))
    for i in range(1, len1 + 1):
        cur = [i] + [0] * len2
        for j in range(1, len2 + 1):
            cost = 0 if s1[i - 1] == s2[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and s1[i - 1] == s2[j - 2]
                and s1[i - 2] == s2[j - 1]
            ):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        prev2, prev = prev, cur
    return float(prev[len2])


def lcs_distance(s1: str, s2: str) -> float:
    """LCS edit distance: len1+len2-2*LCS (reference method='lcs',
    R/fuzzylink.R:183)."""
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return float(len1 + len2)
    prev = [0] * (len2 + 1)
    for i in range(1, len1 + 1):
        cur = [0] * (len2 + 1)
        c1 = s1[i - 1]
        for j in range(1, len2 + 1):
            if c1 == s2[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = cur[j - 1] if cur[j - 1] >= prev[j] else prev[j]
        prev = cur
    return float(len1 + len2 - 2 * prev[len2])


def _qgrams(s: str, q: int = 1) -> dict[str, int]:
    if len(s) < q:
        return {}
    out: dict[str, int] = {}
    for i in range(len(s) - q + 1):
        g = s[i : i + q]
        out[g] = out.get(g, 0) + 1
    return out


def qgram_dist(s1: str, s2: str, q: int = 1) -> float:
    """Bag-of-qgrams L1 distance (reference method='qgram',
    R/fuzzylink.R:184; stringdist default q=1)."""
    g1, g2 = _qgrams(s1, q), _qgrams(s2, q)
    keys = set(g1) | set(g2)
    return float(sum(abs(g1.get(k, 0) - g2.get(k, 0)) for k in keys))


def qgram_jaccard_dist(s1: str, s2: str, q: int = 1) -> float:
    """q-gram Jaccard distance = 1 - |G1∩G2|/|G1∪G2| on gram *sets*
    (reference method='jaccard', R/fuzzylink.R:182)."""
    g1, g2 = set(_qgrams(s1, q)), set(_qgrams(s2, q))
    if not g1 and not g2:
        return 0.0
    union = len(g1 | g2)
    if union == 0:
        return 1.0
    return 1.0 - len(g1 & g2) / union


def qgram_cosine_dist(s1: str, s2: str, q: int = 1) -> float:
    """q-gram profile cosine distance (reference method='cosine',
    R/fuzzylink.R:181)."""
    g1, g2 = _qgrams(s1, q), _qgrams(s2, q)
    if not g1 and not g2:
        return 0.0
    if not g1 or not g2:
        return 1.0
    dot = sum(c * g2.get(k, 0) for k, c in g1.items())
    n1 = sum(c * c for c in g1.values()) ** 0.5
    n2 = sum(c * c for c in g2.values()) ** 0.5
    return 1.0 - dot / (n1 * n2)


# ---------------------------------------------------------------------------
# bit-parallel batched Jaro-Winkler (one x vs many y at once)
# ---------------------------------------------------------------------------

_ALL64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_ONE = np.uint64(1)


class JaroBatch:
    """Precomputed B-side for vectorized JW: per-character 64-bit position
    masks across all y strings. One ``scores(x)`` call runs the exact Jaro
    greedy matching for x against every y simultaneously — each of the
    len(x) steps is a handful of uint64 NumPy ops over the whole batch
    (~15x faster than the scalar loop at typical key lengths).

    Strings longer than 64 chars fall back to the scalar kernel (same
    semantics); linkage keys are far shorter in practice.
    """

    def __init__(self, ys: list[str]):
        self.ys = ys
        n = len(ys)
        self.lens = np.fromiter((len(y) for y in ys), dtype=np.int64, count=n)
        self.too_long = self.lens > 64
        self.charmask: dict[str, np.ndarray] = {}
        maxlen = int(min(self.lens.max() if n else 0, 64))
        self.ycodes = np.full((n, max(maxlen, 1)), -1, dtype=np.int64)
        for yi, y in enumerate(ys):
            if len(y) > 64:
                continue
            for pos, ch in enumerate(y):
                m = self.charmask.get(ch)
                if m is None:
                    m = np.zeros(n, dtype=np.uint64)
                    self.charmask[ch] = m
                m[yi] |= _ONE << np.uint64(pos)
                self.ycodes[yi, pos] = ord(ch)
        self._zeros = np.zeros(n, dtype=np.uint64)

    def scores(self, x: str, p: float = 0.1, max_prefix: int = 4) -> np.ndarray:
        n = len(self.ys)
        out = np.zeros(n, dtype=np.float64)
        if n == 0:
            return out
        lx = len(x)
        if lx == 0 or lx > 64:
            for i, y in enumerate(self.ys):
                out[i] = jaro_winkler(x, y, p, max_prefix)
            return out

        ly = self.lens
        w = np.maximum(np.maximum(lx, ly) // 2 - 1, 0)
        used = np.zeros(n, dtype=np.uint64)
        y_pos = np.full((lx, n), 255, dtype=np.int64)  # matched y bit index per x pos
        xc = np.fromiter((ord(c) for c in x), dtype=np.int64, count=lx)

        for i in range(lx):
            cm = self.charmask.get(x[i])
            if cm is None:
                continue
            lo = np.maximum(0, i - w)
            hi = np.minimum(ly, i + w + 1)
            hi_mask = np.where(hi >= 64, _ALL64, (_ONE << hi.astype(np.uint64)) - _ONE)
            lo_mask = (_ONE << lo.astype(np.uint64)) - _ONE
            cand = cm & hi_mask & ~lo_mask & ~used
            bit = cand & (~cand + _ONE)  # lowest set bit
            used |= bit
            has = cand != 0
            # bit index (bit is a power of two; float64 log2 is exact)
            with np.errstate(divide="ignore"):
                idx = np.where(
                    has, np.log2(np.maximum(bit, _ONE).astype(np.float64)), 255
                ).astype(np.int64)
            y_pos[i] = idx

        matched = y_pos != 255
        m = matched.sum(axis=0)

        # transpositions: compare x-order matched chars vs y-order matched chars
        row = np.arange(lx)[:, None]
        key_i = np.where(matched, row, 9999)
        key_y = np.where(matched, y_pos, 9999)
        perm_i = np.argsort(key_i, axis=0, kind="stable")
        perm_y = np.argsort(key_y, axis=0, kind="stable")
        chars = np.broadcast_to(xc[:, None], (lx, n))
        c_seq = np.take_along_axis(chars, perm_i, axis=0)
        # chars of y at the matched y positions, in y order
        y_bit = np.take_along_axis(np.where(matched, y_pos, 0), perm_y, axis=0)
        valid = row < m[None, :]
        d_seq = np.take_along_axis(
            self.ycodes, np.minimum(y_bit.T, self.ycodes.shape[1] - 1), axis=1
        ).T
        t = ((c_seq != d_seq) & valid).sum(axis=0) / 2.0

        safe_m = np.maximum(m, 1)
        jaro = np.where(
            m == 0,
            0.0,
            (m / lx + m / np.maximum(ly, 1) + (safe_m - t) / safe_m) / 3.0,
        )
        # prefix bonus: common prefix up to max_prefix
        kp = min(max_prefix, lx, self.ycodes.shape[1])
        if kp > 0:
            eq = self.ycodes[:, :kp] == xc[None, :kp]
            prefix = np.cumprod(eq, axis=1).sum(axis=1)
        else:
            prefix = np.zeros(n, dtype=np.int64)
        jw = jaro + prefix * p * (1.0 - jaro)
        # identical strings (incl. both empty) are exactly 1 (stringdist parity)
        exact = np.fromiter((y == x for y in self.ys), dtype=bool, count=n)
        jw = np.where(exact, 1.0, jw)
        if self.too_long.any():
            for i in np.nonzero(self.too_long)[0]:
                jw[i] = jaro_winkler(x, self.ys[i], p, max_prefix)
        return jw


def jaro_winkler_cross(xs: list[str], ys: list[str], p: float = 0.1) -> np.ndarray:
    """All-pairs JW matrix (len(xs), len(ys)) via the batched kernel."""
    batch = JaroBatch(ys)
    out = np.empty((len(xs), len(ys)), dtype=np.float64)
    for i, x in enumerate(xs):
        out[i] = batch.scores(x, p)
    return out


# ---------------------------------------------------------------------------
# pandas UDFs (Arrow-batched)
# ---------------------------------------------------------------------------


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized-at-the-batch JW similarity, lowercased (feature F2)."""
    al = a.fillna("").str.lower().tolist()
    bl = b.fillna("").str.lower().tolist()
    return pd.Series([jaro_winkler(x, y) for x, y in zip(al, bl)], dtype="float64")


_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("jw", T.DoubleType()),
        T.StructField("osa", T.DoubleType()),
        T.StructField("cosine_qgram", T.DoubleType()),
        T.StructField("jaccard_qgram", T.DoubleType()),
        T.StructField("lcs", T.DoubleType()),
        T.StructField("qgram", T.DoubleType()),
    ]
)


@F.pandas_udf(_FEATURES_SCHEMA)
def pair_features_udf(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    """All lexical features (F2-F7) in one Arrow pass per pair.

    Soundex (F8) stays in the Catalyst plan via the builtin
    ``soundex(a) != soundex(b)`` — no reason to cross into Python for it.
    """
    al = a.fillna("").str.lower().tolist()
    bl = b.fillna("").str.lower().tolist()
    rows = {
        "jw": [],
        "osa": [],
        "cosine_qgram": [],
        "jaccard_qgram": [],
        "lcs": [],
        "qgram": [],
    }
    for x, y in zip(al, bl):
        rows["jw"].append(jaro_winkler(x, y))
        rows["osa"].append(osa_distance(x, y))
        rows["cosine_qgram"].append(qgram_cosine_dist(x, y))
        rows["jaccard_qgram"].append(qgram_jaccard_dist(x, y))
        rows["lcs"].append(lcs_distance(x, y))
        rows["qgram"].append(qgram_dist(x, y))
    return pd.DataFrame(rows)


def soundex_neq_col(a_col: str, b_col: str):
    """Soundex inequality distance (F8) as a pure Catalyst expression
    (reference method='soundex', R/fuzzylink.R:185)."""
    return (
        (F.soundex(F.lower(F.col(a_col))) != F.soundex(F.lower(F.col(b_col))))
        .cast("double")
    )
