"""Warm low-latency serving tier over the Spark-built parquet index.

The reference serves queries in ~10 ms because its whole index lives
in Redis RAM on the serving node (``/root/reference/addok/core.py``
+ ``addok/db.py``); the Spark engine in ``query/engine.py`` answers
the same queries rank-identically but pays Spark's per-job scheduling
floor (seconds), which is the right shape for *batch* scoring, not
for interactive lookups.  This module closes that gap the way
Lucene-style systems do: Spark builds and compacts the immutable
index artifacts (blocks / dictionary / prefixes / pairs / docs —
``index/build.py``), and a serving process answers queries straight
from those artifacts with pruned columnar reads:

- the **term dictionary** (token → df, max_boost) is loaded into RAM
  at warm-up — the standard serving trade (Lucene keeps an FST of the
  term dictionary in RAM; at 10^12-turn scale this is the one table
  that stays small relative to postings);
- **posting lists** are fetched lazily per query token from the
  ``blocks`` table: pyarrow dataset scan with a ``token ==`` filter —
  files are token-sorted within pbucket partitions so parquet
  row-group statistics prune everything else — then delta+varint
  decoded with the same numpy codec the build wrote with
  (``index/compress.py``), and kept as sorted numpy arrays
  (docs / tf / boost), not Python dicts;
- **documents** are fetched per pbucket partition only when a doc
  becomes a candidate (hive partition pruning on ``pbucket``);
- **prefixes / pairs** reads are filter-pruned the same way and
  memoized per key.

Sharding story at scale: a serving node owns a pbucket range (the
docs/blocks partition key), so each node's working set is bounded and
queries fan out only for tokens whose postings span shards — the
same partition layout the CDC path already rewrites incrementally.

Rank identity is by construction, not by re-implementation: planning,
rounds, relaxation, cream, and scoring run through the *same*
``SpecSearch`` flow (``oracle/bm25_oracle.py``) that the Spark engine
is rank-identity tested against; this module only (a) swaps the data
access layer from "rebuilt from corpus" to "read from the index
parquet" and (b) overrides the one hot kernel (``run_gids``) with a
numpy-vectorized version whose float64 accumulation order matches the
spec exactly (tested bit-equal in tests/test_local_serving.py).
"""

from __future__ import annotations

import json
import threading
import time
from pathlib import Path

import numpy as np
import pandas as pd

from ..config import EngineConfig
from ..index.build import IndexPaths
from ..index.compress import unpack_deltas, unpack_f32, varint_decode
from ..oracle.bm25_oracle import ExpansionMixin, SpecSearch
from ..query.engine import Query, normalize_filter_values

_EMPTY = (
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.float32),
)

# empty (docs, counts) phrase-match arrays
_EMPTY_PHRASE = (
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
)


class _LRU(dict):
    """Bounded least-recently-USED cache: at 10^12 turns a serving
    node cannot keep every doc row / folded label / probe result it
    ever touched. Hits re-insert the key at the dict tail (plain dict
    preserves insertion order), so eviction removes the least recently
    touched entry — under insertion pressure the Zipf-head working set
    (hot token blocks, hot doc rows) stays resident.

    Thread-safe: the engine's caches are shared across the request
    threads of ThreadingHTTPServer, and the hit path is a non-atomic
    getitem→delitem→setitem re-insert — two concurrent hits on the
    same hot key would race (the loser's delitem raises KeyError).
    A per-cache lock makes each operation atomic; it is uncontended
    in the common case and ~100 ns against block-decode work."""

    __slots__ = ("maxsize", "_lock")

    def __init__(self, maxsize: int):
        super().__init__()
        self.maxsize = maxsize
        self._lock = threading.Lock()

    def get(self, key, default=None):
        with self._lock:
            try:
                value = dict.__getitem__(self, key)
            except KeyError:
                return default
            dict.__delitem__(self, key)
            dict.__setitem__(self, key, value)
            return value

    def __getitem__(self, key):
        with self._lock:
            value = dict.__getitem__(self, key)
            dict.__delitem__(self, key)
            dict.__setitem__(self, key, value)
            return value

    def __setitem__(self, key, value):
        with self._lock:
            if dict.__contains__(self, key):
                dict.__delitem__(self, key)
            elif len(self) >= self.maxsize:
                dict.__delitem__(self, next(iter(self)))
            dict.__setitem__(self, key, value)


def _in_sorted(
    values: np.ndarray,
    sorted_uniq: np.ndarray,
    values_sorted: bool = False,
) -> np.ndarray:
    """Membership mask of ``values`` in a SORTED-UNIQUE array.
    Binary searches only — unlike ``np.isin``, which re-sorts the
    concatenation on every call; every serving set operand is already
    sorted (decode order / np.unique / np.sort), so this is the
    kernel's only membership primitive.

    Two regimes: by default one search per value (O(n log m)). With
    ``values_sorted`` and a much smaller set, the SET is searched
    into the values instead (O(m log n) + matched-range gather) — the
    shape of "restrict a Zipf-head posting list to a k-sized probe
    set", where per-value searching would dominate the kernel."""
    nv, ns = len(values), len(sorted_uniq)
    if not ns or not nv:
        return np.zeros(nv, dtype=bool)
    if values_sorted and ns * 4 < nv:
        lo = np.searchsorted(values, sorted_uniq, side="left")
        hi = np.searchsorted(values, sorted_uniq, side="right")
        lens = hi - lo
        nz = lens > 0
        out = np.zeros(nv, dtype=bool)
        if nz.any():
            starts, lens = lo[nz], lens[nz]
            offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
            idx = (
                np.arange(int(lens.sum()), dtype=np.int64)
                - np.repeat(offs, lens)
                + np.repeat(starts, lens)
            )
            out[idx] = True
        return out
    idx = np.searchsorted(sorted_uniq, values)
    np.minimum(idx, ns - 1, out=idx)
    return sorted_uniq[idx] == values


class _TokenBlocks:
    """Block-granular lazy posting store of ONE token: metadata
    (n / max_boost / min_doc / max_doc) held as numpy, payloads
    decoded per block on first touch. Doc ranges are disjoint across
    a token's blocks (bucket = doc high bits; blocks partition the
    sorted run within a bucket), so point lookups decode exactly one
    block and range probes decode only intersecting blocks."""

    __slots__ = (
        "is_filter", "n", "ub", "mind", "maxd", "n_blocks",
        "_docs_bin", "_tfs_bin", "_boosts_bin", "_dec", "_full",
    )

    def __init__(self, tbl, is_filter: bool):
        self.is_filter = is_filter
        self.n = tbl.column("n").to_numpy()
        self.ub = tbl.column("max_boost").to_numpy()
        self.mind = tbl.column("min_doc").to_numpy()
        self.maxd = tbl.column("max_doc").to_numpy()
        self.n_blocks = len(self.n)
        self._docs_bin = tbl.column("docs_bin")
        self._tfs_bin = None if is_filter else tbl.column("tfs_bin")
        self._boosts_bin = None if is_filter else tbl.column("boosts_bin")
        # per-block decode memo: grows only until full() concatenates
        # and clears it, so worst-case residency is bounded by the
        # posting-store _LRU above (maxsize tokens × this token's
        # blocks) — the store evicts whole _TokenBlocks objects
        self._dec: dict[int, tuple] = {}
        self._full = None

    def decode_block(self, i: int):
        got = self._dec.get(i)
        if got is None:
            docs = unpack_deltas(self._docs_bin[i].as_py()).astype(np.int64)
            if self.is_filter:
                tfs = np.zeros(len(docs), np.int64)
                boosts = np.zeros(len(docs), np.float32)
            else:
                tfs = varint_decode(self._tfs_bin[i].as_py()).astype(np.int64)
                boosts = unpack_f32(self._boosts_bin[i].as_py())
            got = (docs, tfs, boosts)
            self._dec[i] = got
        return got

    def full(self):
        if self._full is None:
            if self.n_blocks == 0:
                self._full = _EMPTY
            else:
                parts = [self.decode_block(i) for i in range(self.n_blocks)]
                docs = np.concatenate([p[0] for p in parts])
                tfs = np.concatenate([p[1] for p in parts])
                boosts = np.concatenate([p[2] for p in parts])
                # fragments arrive in directory-listing order, not
                # doc order — restore the global sort (docs unique)
                o = np.argsort(docs, kind="stable")
                self._full = (docs[o], tfs[o], boosts[o])
                self._dec.clear()
        return self._full

    def point(self, d: int):
        """Arrays containing doc ``d`` if present — one block."""
        if self._full is not None:
            return self._full
        if self.n_blocks == 0:
            return _EMPTY
        hit = np.flatnonzero((self.mind <= d) & (self.maxd >= d))
        if not len(hit):
            return _EMPTY
        return self.decode_block(int(hit[0]))

    def covering(self, docs_sorted: np.ndarray):
        """Concatenated arrays of every block whose doc range
        intersects the sorted candidate set (doc-sorted output).

        Adaptive: when the candidate set is scattered enough that
        most blocks intersect anyway (the common case for a
        scan_limit-sized uniform sample of a Zipf-head posting list),
        partial decode would pay per-block python overhead for no
        pruning — fall through to the cached ``full()`` arrays."""
        if self._full is not None:
            return self._full
        if self.n_blocks == 0 or not len(docs_sorted):
            return _EMPTY
        lo = np.searchsorted(docs_sorted, self.mind)
        has = lo < len(docs_sorted)
        safe = np.minimum(lo, len(docs_sorted) - 1)
        hits = np.flatnonzero(has & (docs_sorted[safe] <= self.maxd))
        if not len(hits):
            return _EMPTY
        if 3 * len(hits) >= self.n_blocks:
            return self.full()
        parts = [self.decode_block(int(i)) for i in hits]
        docs = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts])
        boosts = np.concatenate([p[2] for p in parts])
        o = np.argsort(docs, kind="stable")
        return (docs[o], tfs[o], boosts[o])

    @property
    def blocks_decoded(self) -> int:
        return self.n_blocks if self._full is not None else len(self._dec)


class _PreloadMixin:
    """Shared startup warm-up for anything exposing ``df`` (token →
    document frequency) and ``prefetch_tokens``."""

    def preload_hot(self, n: int) -> int:
        """Warm the block cache with the ``n`` highest-df tokens
        before taking traffic — the deployment analog of the
        reference's everything-in-RAM Redis start. The Zipf head
        carries most query token mass, so preloading it converts the
        bulk of first-touch cold reads into warm hits while loading
        only n tokens' blocks, not the corpus. On the shard
        coordinator the fan-out covers every shard's slice."""
        if n <= 0 or not self.df:
            return 0
        hot = sorted(self.df.items(), key=lambda kv: (-kv[1], kv[0]))[:n]
        self.prefetch_tokens([t for t, _ in hot])
        return len(hot)


class ParquetIndex(ExpansionMixin, _PreloadMixin):
    """OracleIndex-shaped read-only view over the on-disk index.

    Posting lists are numpy triples ``(docs asc, tf, boost_f32)``;
    the dict views the pure-dict spec path expects are derived lazily
    (only the tests' spec-mode runs ever materialize them)."""

    def __init__(
        self,
        index_dir: str | Path,
        cfg: EngineConfig | None = None,
        pbucket_range: tuple[int, int] | None = None,
    ):
        import pyarrow.dataset as pads

        self._pads = pads
        self.cfg = cfg or EngineConfig()
        # pin to the currently-published snapshot: all lazy posting /
        # doc / prefix reads of this serving view come from ONE index
        # version; refresh() re-pins to pick up a newer publish
        self.paths = (
            index_dir if isinstance(index_dir, IndexPaths)
            else IndexPaths(Path(index_dir))
        ).pin()
        # shard mode: this node owns [lo, hi) of the pbucket space —
        # every blocks/docs read is partition-pruned to that range
        self.pbucket_range = pbucket_range
        man = self.paths.read_snapshot_manifest()
        if man is not None and not man.get("materialized", True):
            # serving reads individual parquet files by offset and
            # needs a physical layout; an object-store snapshot is
            # reference-only — sync it to local disk first (what a
            # real serving node's cache pull does)
            raise ValueError(
                "snapshot is reference-only (object-store publish); "
                "materialize it locally first: "
                "addok_spark.index.build.materialize_snapshot(paths, dest)"
            )
        self.meta = json.loads(self.paths.meta.read_text())
        self.n_docs = int(self.meta["n_docs"])
        self.avgdl = float(self.meta["avgdl"])
        self._bucket_bits = int(self.meta["doc_bucket_bits"])
        self._doc_shift = int(self.meta["doc_bucket_bits"]) + int(
            self.meta.get("pbucket_shift", 6)
        )

        self._blocks_ds = pads.dataset(self.paths.blocks, partitioning="hive")
        self._docs_ds = pads.dataset(self.paths.docs, partitioning="hive")
        try:
            self._prefix_ds = pads.dataset(self.paths.prefixes, partitioning="hive")
        except Exception:
            self._prefix_ds = None
        try:
            self._pairs_ds = pads.dataset(self.paths.pairs, partitioning="hive")
        except Exception:
            self._pairs_ds = None
        self.have_pairs = self._pairs_ds is not None

        # term dictionary in RAM (token → df / max_boost, float32
        # parity with dictionary_from_blocks)
        t0 = time.perf_counter()
        dic = self._pads.dataset(self.paths.dictionary).to_table(
            columns=["token", "df", "max_boost"]
        ).to_pandas()
        self.df: dict[str, int] = dict(zip(dic["token"], dic["df"].astype(int)))
        self.max_boost: dict[str, float] = dict(
            zip(dic["token"], dic["max_boost"].astype(float))
        )
        self.warmup_seconds = time.perf_counter() - t0

        self._blocks: dict[str, _TokenBlocks] = _LRU(100_000)
        self._scan_cache: dict[tuple, tuple] = _LRU(1024)
        self._dict_views: dict[str, dict[int, float]] = _LRU(10_000)
        self._doc_cache: dict[int, pd.DataFrame] = _LRU(64)
        self._row_cache: dict[int, dict] = _LRU(100_000)
        self._fold_cache: dict[int, str] = _LRU(100_000)
        self._prefix_cache: dict[str, list[str]] = _LRU(50_000)
        self._pair_cache: dict[str, set[str]] = _LRU(50_000)
        self._pos_cache: dict[str, tuple] = _LRU(10_000)

    def refresh(self) -> None:
        """Re-open the index after a CDC batch: re-resolves the
        published snapshot (CURRENT.json — CDC publishes versioned
        snapshot dirs with one atomic manifest swap, incremental.py)
        and reloads the term dictionary. Crash-safe swap: the fresh
        view is built COMPLETELY on the side and only then replaces
        this object's state, so a transient read failure mid-reload
        leaves the serving instance answering from the old snapshot
        (in-flight queries keep their pinned caches either way)."""
        fresh = ParquetIndex(
            IndexPaths(Path(self.paths.root)), self.cfg, self.pbucket_range
        )
        self.__dict__.update(fresh.__dict__)

    # -- postings -----------------------------------------------------------
    def _read_token_blocks(self, token: str) -> "_TokenBlocks":
        """Uncached pruned blocks read for one token (thread-safe:
        touches only the immutable dataset handle)."""
        f = self._pads.field
        tok_filter = f("token") == token
        if self.pbucket_range is not None:
            lo, hi = self.pbucket_range
            tok_filter = tok_filter & (f("pbucket") >= lo) & (f("pbucket") < hi)
        is_filter = token.startswith("f|")
        cols = ["n", "max_boost", "min_doc", "max_doc", "docs_bin"]
        if not is_filter:
            cols += ["tfs_bin", "boosts_bin"]
        tbl = self._blocks_ds.to_table(filter=tok_filter, columns=cols)
        return _TokenBlocks(tbl, is_filter)

    def _token_blocks(self, token: str) -> "_TokenBlocks":
        """Per-block lazy posting store for one token: block metadata
        (n / max_boost / min_doc / max_doc) up front, payloads decoded
        on demand — the serving analog of the Spark engine's block-max
        pruning. One pruned blocks read per token per process."""
        tb = self._blocks.get(token)
        if tb is not None:
            return tb
        tb = self._read_token_blocks(token)
        self._blocks[token] = tb
        return tb

    def prefetch_tokens(self, tokens) -> None:
        """Concurrent first-touch of several tokens' pruned blocks
        reads (pyarrow releases the GIL inside ``to_table``), so a
        cold multi-token query pays ~one parquet read latency instead
        of one per token. Reads run in worker threads against the
        immutable dataset; cache insertion stays on the caller's
        thread (the _LRU is not thread-safe)."""
        todo = [
            t for t in dict.fromkeys(tokens)
            if t and self._blocks.get(t) is None
        ]
        if not todo:
            return
        if len(todo) == 1:
            self._token_blocks(todo[0])
            return
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(todo))) as ex:
            built = list(ex.map(self._read_token_blocks, todo))
        for t, tb in zip(todo, built):
            if self._blocks.get(t) is None:
                self._blocks[t] = tb

    def _token_arrays(self, token: str):
        """(docs asc int64, tf int64, boost float32) for one token —
        full decode, cached (the non-scan collection path)."""
        return self._token_blocks(token).full()

    def scan_top_docs(self, tokens: list[str], limit: int) -> np.ndarray:
        """Exact top-``limit`` doc set of a token group by
        (-boost, doc) — see ``_scan_top``."""
        du, _ = self._scan_top(tokens, limit)
        return np.sort(du)

    def _scan_top(self, tokens: list[str], limit: int):
        key = (tuple(tokens), limit)
        cached = self._scan_cache.get(key)
        if cached is None:
            cached = self._scan_top_uncached(tokens, limit)
            self._scan_cache[key] = cached
        return cached

    def _scan_top_uncached(self, tokens: list[str], limit: int):
        """Exact top-``limit`` (docs, boosts) of a token group by
        (-boost, doc) — per-doc max over the group's tokens — decoding
        blocks in max_boost-descending order and stopping as soon as
        no remaining block's upper bound can reach the current k-th
        boost (ties decoded, so the doc-index tie-break stays exact).
        This is block-max pruning for the manual-scan probe: on a
        Zipf-head token only the high-boost blocks are ever decoded."""
        entries = []  # (ub, TokenBlocks, block_idx)
        for t in tokens:
            tb = self._token_blocks(t)
            for i in range(tb.n_blocks):
                entries.append((float(tb.ub[i]), tb, i))
        entries.sort(key=lambda e: -e[0])
        dparts: list[np.ndarray] = []
        bparts: list[np.ndarray] = []
        kth = None
        pos = 0

        def _reduce():
            dall = np.concatenate(dparts)
            ball = np.concatenate(bparts)
            o = np.argsort(dall, kind="stable")
            du, starts = np.unique(dall[o], return_index=True)
            return du, np.maximum.reduceat(ball[o], starts)

        while pos < len(entries):
            # pick the next chunk that can still affect the top set:
            # before a threshold exists, enough blocks to cover
            # ``limit`` postings; afterwards every block whose upper
            # bound reaches the current k-th boost (ties INCLUDED so
            # the doc-index tie-break stays exact)
            chunk_end = pos
            if kth is None:
                need = limit
                while chunk_end < len(entries) and need > 0:
                    need -= int(entries[chunk_end][1].n[entries[chunk_end][2]])
                    chunk_end += 1
            else:
                while chunk_end < len(entries) and entries[chunk_end][0] >= kth:
                    chunk_end += 1
                if chunk_end == pos:
                    break
            for ub, tb, i in entries[pos:chunk_end]:
                docs, _, boosts = tb.decode_block(i)
                dparts.append(docs)
                bparts.append(boosts.astype(np.float64))
            pos = chunk_end
            if not dparts:
                break
            du, bu = _reduce()
            if len(du) >= limit:
                top = np.lexsort((du, -bu))[:limit]
                kth = float(bu[top].min())
            elif pos >= len(entries):
                break
        if not dparts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        du, bu = _reduce()
        top = np.lexsort((du, -bu))[:limit]
        return du[top], bu[top]

    def arrays_within(self, token: str, docs_sorted: np.ndarray):
        """Postings of ``token`` restricted to a sorted candidate doc
        set, decoding only blocks whose [min_doc, max_doc] range
        intersects it (the membership/boost probe of scan-mode
        conjunctions and of per-candidate scoring)."""
        tb = self._token_blocks(token)
        return tb.covering(docs_sorted)

    def token_position_arrays(self, token: str, within_docs=None):
        """(docs repeated per occurrence int64, absolute position
        int64) for one token — pos_bin decoded with the same
        cumsum + per-posting offset reset the Spark phrase operator
        uses (query/phrase.py). One pruned read per token, memoized.

        ``within_docs`` (sorted unique int64 array) restricts the
        DECODE to blocks whose [min_doc, max_doc] range intersects
        it — the phrase path passes the rarest token's doc set, so a
        stopword decodes at most |rare docs| blocks instead of its
        whole positional stream (the Spark engine's rare-token
        conjunction, applied at block granularity; bucket-granular
        pruning is too coarse — a 63-doc token touches most of a
        small corpus's doc-range buckets). When the doc set spans
        few buckets the read itself is also bucket-filtered (real IO
        pruning once the corpus has many buckets). Restricted
        decodes are not token-cached — the phrase layer memoizes at
        whole-phrase granularity instead; a cached full decode is
        sliced, never re-read."""
        cached = self._pos_cache.get(token)
        if cached is not None:
            if within_docs is not None:
                docs, pos = cached
                m = _in_sorted(docs, within_docs)
                return docs[m], pos[m]
            return cached
        f = self._pads.field
        tok_filter = f("token") == token
        if self.pbucket_range is not None:
            lo, hi = self.pbucket_range
            tok_filter = tok_filter & (f("pbucket") >= lo) & (f("pbucket") < hi)
        cols = ["docs_bin", "tfs_bin", "pos_bin"]
        if within_docs is not None:
            buckets = np.unique(
                np.asarray(within_docs, np.int64) >> self._bucket_bits
            )
            if len(buckets) <= 256:
                tok_filter = tok_filter & f("bucket").isin(
                    [int(x) for x in buckets]
                )
            cols = ["min_doc", "max_doc"] + cols
        tbl = self._blocks_ds.to_table(filter=tok_filter, columns=cols)
        if within_docs is not None and tbl.num_rows:
            # keep only blocks whose doc range holds a target doc
            import pyarrow as pa

            mn = tbl.column("min_doc").to_numpy()
            mx = tbl.column("max_doc").to_numpy()
            keep = np.searchsorted(within_docs, mn, "left") < np.searchsorted(
                within_docs, mx + 1, "left"
            )
            tbl = tbl.filter(pa.array(keep))
        dparts, pparts = [], []
        for db, tb, pb in zip(
            tbl.column("docs_bin"), tbl.column("tfs_bin"), tbl.column("pos_bin")
        ):
            docs = unpack_deltas(db.as_py()).astype(np.int64)
            tfs = varint_decode(tb.as_py()).astype(np.int64)
            deltas = varint_decode(pb.as_py()).astype(np.int64)
            if not len(deltas):
                continue
            starts = np.cumsum(tfs) - tfs
            c = np.cumsum(deltas)
            off = np.zeros(len(tfs), dtype=np.int64)
            off[1:] = c[starts[1:] - 1]
            dparts.append(np.repeat(docs, tfs))
            pparts.append(c - np.repeat(off, tfs))
        if dparts:
            out = (np.concatenate(dparts), np.concatenate(pparts))
        else:
            out = (np.empty(0, np.int64), np.empty(0, np.int64))
        if within_docs is None:
            self._pos_cache[token] = out
            return out
        docs, pos = out
        m = _in_sorted(docs, within_docs)
        return docs[m], pos[m]

    def token_positions(self, token: str) -> dict[int, list[int]]:
        """Dict view of the position streams (spec path)."""
        docs, pos = self.token_position_arrays(token)
        view: dict[int, list[int]] = {}
        for d, p in zip(docs.tolist(), pos.tolist()):
            view.setdefault(d, []).append(p)
        return view

    def postings(self, token: str) -> dict[int, float]:
        """Dict view for the pure-dict spec path (tests); the fast
        path never materializes these."""
        view = self._dict_views.get(token)
        if view is None:
            docs, _, boosts = self._token_arrays(token)
            view = dict(
                zip(docs.tolist(), boosts.astype(np.float64).tolist())
            )
            self._dict_views[token] = view
        return view

    def posting_count(self, token: str) -> int:
        # block metadata only — counting never decodes payloads
        return int(self._token_blocks(token).n.sum())

    def tf_of(self, token: str, d: int) -> int:
        docs, tfs, _ = self._token_blocks(token).point(d)
        i = int(np.searchsorted(docs, d))
        return int(tfs[i]) if i < len(docs) and docs[i] == d else 0

    def boost_of(self, token: str, d: int) -> float:
        docs, _, boosts = self._token_blocks(token).point(d)
        i = int(np.searchsorted(docs, d))
        return float(boosts[i])

    def any_shared_docs(self, a: str, b: str) -> bool:
        da = self._token_arrays(a)[0]
        db = self._token_arrays(b)[0]
        if not len(da) or not len(db):
            return False
        return bool(
            len(np.intersect1d(da, db, assume_unique=True))
        )

    def tf_boost_many(self, token: str, docs_sorted):
        """Bulk (tf, boost) gather over a sorted candidate array —
        ONE block-pruned read + one binary-search gather per token,
        replacing per-(token, doc) point decodes in the scoring fold
        (value-identical to the spec's point accessors; the float
        path is the same f32 → float64 widening)."""
        docs_sorted = np.asarray(docs_sorted, dtype=np.int64)
        docs, tfs, boosts = self.arrays_within(token, docs_sorted)
        n = len(docs_sorted)
        out_tf = np.zeros(n, dtype=np.int64)
        out_b = np.zeros(n, dtype=np.float64)
        if len(docs):
            idx = np.searchsorted(docs, docs_sorted)
            np.minimum(idx, len(docs) - 1, out=idx)
            hit = docs[idx] == docs_sorted
            out_tf[hit] = tfs[idx[hit]]
            out_b[hit] = boosts[idx[hit]].astype(np.float64)
        return out_tf, out_b

    # -- documents ----------------------------------------------------------
    def _doc_frame(self, pbucket: int) -> pd.DataFrame:
        frame = self._doc_cache.get(pbucket)
        if frame is None:
            f = self._pads.field
            tbl = self._docs_ds.to_table(filter=f("pbucket") == pbucket)
            frame = tbl.to_pandas().set_index("doc_index", drop=False)
            self._doc_cache[pbucket] = frame
        return frame

    def doc(self, d: int):
        d = int(d)
        row = self._row_cache.get(d)
        if row is None:
            # plain-dict rows, not pandas Series: the scoring fold
            # reads several fields per candidate and Series scalar
            # __getitem__ is ~50× a dict probe (it dominated the warm
            # serving profile); dict supports the documented row[col]
            # / row.get contract identically
            row = self._doc_frame(d >> self._doc_shift).loc[d].to_dict()
            self._row_cache[d] = row
        return row

    def doc_len(self, d: int) -> int:
        return int(self.doc(d)["dl"])

    def get_doc(self, conv_id: str, turn_idx: int):
        """Direct lookup by natural key (≙ Result.from_id,
        reference results.py / tests/test_search.py:567-570).
        Docs files are (conv_id, turn_idx)-sorted within pbucket
        partitions — the doc_index assignment order — so parquet
        row-group statistics prune the scan. Returns a row or None."""
        f = self._pads.field
        tbl = self._docs_ds.to_table(
            filter=(f("conv_id") == conv_id) & (f("turn_idx") == int(turn_idx))
        )
        if tbl.num_rows == 0:
            return None
        return tbl.to_pandas().iloc[0]

    def folded_text(self, d: int) -> str:
        d = int(d)
        ft = self._fold_cache.get(d)
        if ft is None:
            from ..functions.text import fold_str

            ft = fold_str(self.doc(d)["text"] or "")
            self._fold_cache[d] = ft
        return ft

    # -- prefixes / pairs ---------------------------------------------------
    def prefix_candidates(self, prefix: str, cap: int = 100) -> list[str]:
        """≙ OracleIndex.prefix_candidates, reading the prefixes table
        (prefix-sorted within pfx_bucket files → row-group pruning)."""
        cached = self._prefix_cache.get(prefix)
        if cached is None:
            if self._prefix_ds is None:
                cached = []
            else:
                f = self._pads.field
                tbl = self._prefix_ds.to_table(
                    filter=f("prefix") == prefix, columns=["token", "df"]
                )
                rows = list(
                    zip(tbl.column("token").to_pylist(), tbl.column("df").to_pylist())
                )
                rows.sort(key=lambda x: (-x[1], x[0]))
                cached = [t for t, _ in rows]
            self._prefix_cache[prefix] = cached
        return cached[:cap]

    def cooc(self, a: str, b: str) -> bool:
        if a == b or self._pairs_ds is None:
            return False
        lo, hi = (a, b) if a < b else (b, a)
        s = self._pair_cache.get(lo)
        if s is None:
            f = self._pads.field
            tbl = self._pairs_ds.to_table(
                filter=f("token_a") == lo, columns=["token_b"]
            )
            s = set(tbl.column("token_b").to_pylist())
            self._pair_cache[lo] = s
        return hi in s


class ShardedIndex(ExpansionMixin, _PreloadMixin):
    """Scatter-gather coordinator over pbucket-range shards — the
    horizontal-scaling shape of the serving tier at 10^12 turns.

    Each shard is a ParquetIndex restricted to a contiguous
    ``[lo, hi)`` slice of the pbucket space (in production: a serving
    node owning those partitions on local disk).  Because pbucket is
    the HIGH bits of doc_index, contiguous shard ranges are contiguous
    doc ranges, so concatenating per-shard posting arrays in shard
    order yields the exact doc-sorted arrays of the unsharded index —
    ``FastSearch`` runs on this coordinator unchanged and the results
    are rank-identical by construction (tested in
    tests/test_local_serving.py).  Global stats (dictionary, prefixes,
    pairs, meta) are broadcast state: small, read once by the
    coordinator."""

    def __init__(
        self,
        index_dir: str | Path,
        cfg: EngineConfig | None = None,
        n_shards: int = 2,
    ):
        self.cfg = cfg or EngineConfig()
        # coordinator-held global state (dictionary / prefixes /
        # pairs / meta) via an unrestricted index that is never asked
        # for postings
        self._global = ParquetIndex(index_dir, self.cfg)
        self.meta = self._global.meta
        self.n_docs = self._global.n_docs
        self.avgdl = self._global.avgdl
        self.df = self._global.df
        self.max_boost = self._global.max_boost
        self.have_pairs = self._global.have_pairs
        self._doc_shift = self._global._doc_shift
        self._bucket_bits = self._global._bucket_bits
        max_pb = (max(self.n_docs - 1, 0) >> self._doc_shift) + 1
        step = max(1, -(-max_pb // n_shards))
        self._bounds = [
            (i * step, min((i + 1) * step, max_pb) if i < n_shards - 1 else max_pb)
            for i in range(n_shards)
        ]
        self.shards = [
            ParquetIndex(index_dir, self.cfg, pbucket_range=b)
            for b in self._bounds
        ]
        self._dict_views: dict[str, dict[int, float]] = _LRU(10_000)

    def _owner(self, d: int) -> "ParquetIndex":
        pb = int(d) >> self._doc_shift
        for (lo, hi), sh in zip(self._bounds, self.shards):
            if lo <= pb < hi:
                return sh
        return self.shards[-1]

    # -- postings: scatter-gather, concat stays doc-sorted ------------------
    def _token_arrays(self, token: str):
        parts = [sh._token_arrays(token) for sh in self.shards]
        parts = [p for p in parts if len(p[0])]
        if not parts:
            return _EMPTY
        if len(parts) == 1:
            return parts[0]
        return tuple(np.concatenate([p[i] for p in parts]) for i in range(3))

    def postings(self, token: str) -> dict[int, float]:
        view = self._dict_views.get(token)
        if view is None:
            docs, _, boosts = self._token_arrays(token)
            view = dict(zip(docs.tolist(), boosts.astype(np.float64).tolist()))
            self._dict_views[token] = view
        return view

    def posting_count(self, token: str) -> int:
        return sum(sh.posting_count(token) for sh in self.shards)

    def scan_top_docs(self, tokens: list[str], limit: int) -> np.ndarray:
        """Global exact top-``limit`` = reduce of per-shard block-max
        tops (shard doc spaces are disjoint, so per-shard top-limit
        sets cover the global top-limit)."""
        parts = [sh._scan_top(tokens, limit) for sh in self.shards]
        du = np.concatenate([p[0] for p in parts])
        bu = np.concatenate([p[1] for p in parts])
        if not len(du):
            return du.astype(np.int64)
        top = np.lexsort((du, -bu))[:limit]
        return np.sort(du[top])

    def token_position_arrays(self, token: str, within_docs=None):
        parts = [
            sh.token_position_arrays(token, within_docs=within_docs)
            for sh in self.shards
        ]
        parts = [p for p in parts if len(p[0])]
        if not parts:
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        if len(parts) == 1:
            return parts[0]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )

    def token_positions(self, token: str) -> dict[int, list[int]]:
        docs, pos = self.token_position_arrays(token)
        view: dict[int, list[int]] = {}
        for d, p in zip(docs.tolist(), pos.tolist()):
            view.setdefault(d, []).append(p)
        return view

    def arrays_within(self, token: str, docs_sorted: np.ndarray):
        parts = [
            sh.arrays_within(token, docs_sorted) for sh in self.shards
        ]
        parts = [p for p in parts if len(p[0])]
        if not parts:
            return _EMPTY
        if len(parts) == 1:
            return parts[0]
        docs = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts])
        boosts = np.concatenate([p[2] for p in parts])
        o = np.argsort(docs, kind="stable")
        return (docs[o], tfs[o], boosts[o])

    def tf_of(self, token: str, d: int) -> int:
        return self._owner(d).tf_of(token, d)

    def boost_of(self, token: str, d: int) -> float:
        return self._owner(d).boost_of(token, d)

    def prefetch_tokens(self, tokens) -> None:
        """Scatter the cold-read fan-out across (shard, token) pairs
        in one thread pool — cache insertion per shard stays on this
        thread (see ParquetIndex.prefetch_tokens)."""
        pairs = [
            (sh, t)
            for t in dict.fromkeys(tokens)
            for sh in self.shards
            if t and sh._blocks.get(t) is None
        ]
        if not pairs:
            return
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(pairs))) as ex:
            built = list(
                ex.map(lambda p: p[0]._read_token_blocks(p[1]), pairs)
            )
        for (sh, t), tb in zip(pairs, built):
            if sh._blocks.get(t) is None:
                sh._blocks[t] = tb

    def tf_boost_many(self, token: str, docs_sorted):
        # candidate array is sorted and shards own contiguous pbucket
        # (= doc high-bit) ranges, so each shard's slice is one
        # contiguous run — scatter the gather, stitch in place
        docs_sorted = np.asarray(docs_sorted, dtype=np.int64)
        out_tf = np.zeros(len(docs_sorted), dtype=np.int64)
        out_b = np.zeros(len(docs_sorted), dtype=np.float64)
        pbs = docs_sorted >> self._doc_shift
        for (lo, hi), sh in zip(self._bounds, self.shards):
            a = int(np.searchsorted(pbs, lo, side="left"))
            b = int(np.searchsorted(pbs, hi, side="left"))
            if b > a:
                out_tf[a:b], out_b[a:b] = sh.tf_boost_many(
                    token, docs_sorted[a:b]
                )
        return out_tf, out_b

    def any_shared_docs(self, a: str, b: str) -> bool:
        # co-occurrence happens within one doc, i.e. within one shard
        return any(sh.any_shared_docs(a, b) for sh in self.shards)

    # -- documents: routed to the owning shard ------------------------------
    def doc(self, d: int):
        return self._owner(d).doc(d)

    def doc_len(self, d: int) -> int:
        return self._owner(d).doc_len(d)

    def folded_text(self, d: int) -> str:
        return self._owner(d).folded_text(d)

    def get_doc(self, conv_id: str, turn_idx: int):
        return self._global.get_doc(conv_id, turn_idx)

    # -- global side tables -------------------------------------------------
    def prefix_candidates(self, prefix: str, cap: int = 100) -> list[str]:
        return self._global.prefix_candidates(prefix, cap)

    def cooc(self, a: str, b: str) -> bool:
        return self._global.cooc(a, b)

    def refresh(self) -> None:
        # side-build + swap (see ParquetIndex.refresh): a failure
        # mid-reload leaves the coordinator serving the old snapshot
        fresh = ShardedIndex(
            Path(self._global.paths.root), self.cfg, n_shards=len(self.shards)
        )
        self.__dict__.update(fresh.__dict__)


class FastSearch(SpecSearch):
    """SpecSearch with the collection kernel vectorized: per-group
    max-boost posting arrays, k-way sorted-set intersection (smallest
    group first), float64 pre-score accumulation in the spec's sorted-
    gid order, lexsort top-``bucket_limit`` with the identical
    (-score, doc) tie-break.  Everything outside this kernel — rounds,
    relaxation, cream, cliques, scoring — is inherited from the spec."""

    def phrase_occurrences(self, seq: list[str]) -> dict[int, int]:
        """Vectorized twin of the spec's positional anchor
        intersection: (doc, anchor) pairs packed into int64 keys,
        np.isin intersection across sequence offsets, per-doc counts
        from one unique pass — value-identical to the dict/set spec
        (same pairs, same counts).

        Same scale bound as the Spark engine's phrase collection: a
        match doc must contain EVERY phrase token, so every stream is
        restricted to the rarest token's doc set — and the rarest
        token is known from the RAM dictionary (df probe, no decode),
        so the other tokens DECODE only the posting blocks whose
        [min_doc, max_doc] range intersects that doc set: a stopword
        decodes at most |rare docs| of its blocks instead of its
        whole Zipf-head positional stream. Whole-phrase results are
        memoized (LRU), so repeat phrases skip the read entirely."""
        docs, cnts = self._phrase_arrays(seq)
        return dict(zip(docs.tolist(), cnts.tolist()))

    def phrase_candidates(
        self, seq: list[str], filter_docsets: list[set[int]], bucket_limit: int
    ) -> list[int]:
        """Ordered-candidate twin of the spec's phrase branch: the
        memoized arrays are ALREADY in (-occurrences, doc) order, so
        a repeat phrase pays a cache probe + slice — never a re-sort
        of a corpus-scale match map (a two-common-token phrase can
        match a large fraction of the corpus; sorting that on every
        warm query dominated serving phrase latency at 1.6M turns).
        Filter sets subset the ordered stream, preserving order —
        identical output to the spec's filter-then-sort."""
        docs, _ = self._phrase_arrays(seq)
        for fdocs in filter_docsets:
            if not len(docs):
                break
            fa = np.sort(np.fromiter(fdocs, np.int64, len(fdocs)))
            docs = docs[_in_sorted(docs, fa)]
        return docs[:bucket_limit].tolist()

    def _phrase_arrays(self, seq: list[str]):
        """Memoized (docs, counts) int64 arrays ordered (-count,
        doc); the lexsort runs once per distinct phrase at decode
        time."""
        key = tuple(seq)
        cache = getattr(self, "_phrase_cache", None)
        if cache is None:
            cache = self._phrase_cache = _LRU(1024)
        hit = cache.get(key)
        if hit is None:
            du, cu = self._phrase_match_arrays(seq)
            o = np.lexsort((du, -cu))
            hit = (du[o], cu[o])
            cache[key] = hit
        return hit

    def _phrase_match_arrays(self, seq: list[str]):
        index = self.index
        L = len(seq)
        if not seq:
            return _EMPTY_PHRASE
        dfs = index.df
        uniq = list(dict.fromkeys(seq))
        if any(dfs.get(t, 0) == 0 for t in uniq):
            return _EMPTY_PHRASE
        rare_tok = min(uniq, key=lambda t: (dfs.get(t, 0), t))
        rare = index.token_position_arrays(rare_tok)
        if not len(rare[0]):
            return _EMPTY_PHRASE
        rare_docs = np.unique(rare[0])
        decoded = {rare_tok: rare}
        for t in uniq:
            if t in decoded:
                continue
            a = index.token_position_arrays(t, within_docs=rare_docs)
            if not len(a[0]):
                return _EMPTY_PHRASE
            decoded[t] = a
        bounded = []
        for t in seq:
            docs, pos = decoded[t]
            m = _in_sorted(docs, rare_docs)
            if not m.all():
                docs, pos = docs[m], pos[m]
            if not len(docs):
                return _EMPTY_PHRASE
            bounded.append((docs, pos))
        arrs = bounded
        maxpos = max(int(a[1].max()) for a in arrs)
        m = maxpos + L + 2
        keys = None
        for off, (docs, pos) in enumerate(arrs):
            k = np.unique(docs * m + (pos - off + L))
            if keys is None:
                keys = k
            else:
                keys = keys[_in_sorted(keys, k)]
            if not len(keys):
                return _EMPTY_PHRASE
        du, cu = np.unique(keys // m, return_counts=True)
        return du.astype(np.int64), cu.astype(np.int64)

    @staticmethod
    def _group_max(parts: list[tuple[np.ndarray, np.ndarray]]):
        """(docs asc unique, per-doc max boost) from per-token
        (docs, boost_f64) fragments."""
        if not parts:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        if len(parts) == 1:
            return parts[0]
        docs = np.concatenate([p[0] for p in parts])
        bo = np.concatenate([p[1] for p in parts])
        o = np.argsort(docs, kind="stable")
        docs, bo = docs[o], bo[o]
        docs, starts = np.unique(docs, return_index=True)
        return docs, np.maximum.reduceat(bo, starts)

    def run_gids(
        self,
        groups: dict[int, list[str]],
        group_dfs: dict[int, int],
        gids: list[int],
        bucket_limit: int,
        use_scan: bool = True,
    ) -> list[int]:
        # whole-round memo (the collection analog of the phrase-array
        # memo): the result depends only on the gid→token-group map,
        # the cap and the strategy flag — index content is pinned per
        # snapshot (refresh() drops this cache). Zipf-head rounds
        # ("the is data") re-run identical kernels across queries and
        # warm repeats; a hit skips the posting intersections whole.
        key = (
            tuple(sorted((g, tuple(groups[g])) for g in gids)),
            bucket_limit, bool(use_scan),
        )
        cache = getattr(self, "_round_cache", None)
        if cache is None:
            cache = self._round_cache = _LRU(4096)
        hit = cache.get(key)
        if hit is not None:
            return list(hit)
        out = self._run_gids_uncached(
            groups, group_dfs, gids, bucket_limit, use_scan
        )
        cache[key] = tuple(out)
        return out

    def _run_gids_uncached(
        self,
        groups: dict[int, list[str]],
        group_dfs: dict[int, int],
        gids: list[int],
        bucket_limit: int,
        use_scan: bool = True,
    ) -> list[int]:
        index, cfg = self.index, self.cfg
        do_scan = use_scan and all(
            group_dfs.get(g, 0) > cfg.intersect_limit for g in gids
        )
        gdocs: dict[int, np.ndarray] = {}
        gboost: dict[int, np.ndarray] = {}
        if do_scan and hasattr(index, "scan_top_docs"):
            # manual-scan mode with block-max pruning: the probe set
            # (top scan_limit of the smallest group by (-boost, doc))
            # comes from a partial decode in max_boost order, and
            # every other group decodes ONLY the blocks whose doc
            # range intersects the probe set. Semantics identical to
            # the spec (scan restriction applied during accumulation
            # ⟺ group arrays pre-restricted to the probe set).
            sgid = min(gids, key=lambda g: (group_dfs.get(g, 0), g))
            scan_set = index.scan_top_docs(groups[sgid], cfg.scan_limit)
            for gid in gids:
                parts = []
                for t in groups[gid]:
                    docs, _, boosts = index.arrays_within(t, scan_set)
                    if len(docs):
                        m = _in_sorted(docs, scan_set, values_sorted=True)
                        if m.any():
                            parts.append(
                                (docs[m], boosts[m].astype(np.float64))
                            )
                gdocs[gid], gboost[gid] = self._group_max(parts)
        else:
            for gid in gids:
                parts = []
                for t in groups[gid]:
                    docs, _, boosts = index._token_arrays(t)
                    if len(docs):
                        parts.append((docs, boosts.astype(np.float64)))
                gdocs[gid], gboost[gid] = self._group_max(parts)
            if do_scan:
                # index without block metadata: probe from the full
                # arrays (same spec, no pruning)
                sgid = min(gids, key=lambda g: (group_dfs.get(g, 0), g))
                d_s, b_s = gdocs[sgid], gboost[sgid]
                top_s = np.lexsort((d_s, -b_s))[: cfg.scan_limit]
                scan_set = np.sort(d_s[top_s])
                for gid in gids:
                    m = _in_sorted(gdocs[gid], scan_set, values_sorted=True)
                    gdocs[gid] = gdocs[gid][m]
                    gboost[gid] = gboost[gid][m]

        common: np.ndarray | None = None
        for gid in sorted(gids, key=lambda g: len(gdocs[g])):
            if common is None:
                common = gdocs[gid]
            else:
                common = common[_in_sorted(common, gdocs[gid])]
            if not len(common):
                return []
        if common is None or not len(common):
            return []

        pre = np.zeros(len(common), dtype=np.float64)
        for gid in sorted(gids):
            pre += gboost[gid][np.searchsorted(gdocs[gid], common)]
        top = np.lexsort((common, -pre))[:bucket_limit]
        return [int(d) for d in common[top]]


class LocalSearchEngine:
    """Drop-in low-latency twin of ``query.engine.SearchEngine``:
    same ``search(list[Query]) -> frame-of-ranked-rows`` contract,
    answered from the parquet index without a Spark job.

    ``mode="fast"`` (default) uses the vectorized collection kernel;
    ``mode="spec"`` runs the pure-dict oracle flow end to end (the
    tests assert both produce bit-identical results)."""

    def __init__(
        self,
        index_dir: str | Path,
        cfg: EngineConfig | None = None,
        mode: str = "fast",
        shards: int | None = None,
    ):
        self.cfg = cfg or EngineConfig()
        self.index = (
            ShardedIndex(index_dir, self.cfg, n_shards=shards)
            if shards
            else ParquetIndex(index_dir, self.cfg)
        )
        if mode not in ("fast", "spec"):
            raise ValueError(f"unknown mode {mode!r}")
        self._searcher = (
            FastSearch(self.index, self.cfg)
            if mode == "fast"
            else SpecSearch(self.index, self.cfg)
        )

    def _analyzed(self, q: str) -> list[str]:
        cache = getattr(self, "_an_cache", None)
        if cache is None:
            cache = self._an_cache = _LRU(4096)
        toks = cache.get(q)
        if toks is None:
            from ..functions.text import analyze_str

            toks = analyze_str(q, self.cfg.synonyms, self.cfg.processors)
            cache[q] = toks
        return toks

    def preload(self, n_hot_tokens: int = 1000) -> int:
        """Warm the posting cache with the Zipf-head token blocks
        before serving traffic (see ParquetIndex.preload_hot)."""
        return self.index.preload_hot(n_hot_tokens)

    def refresh(self) -> None:
        """Pick up a CDC-rewritten index (see ParquetIndex.refresh)."""
        self.index.refresh()
        # searcher-level memos (whole-phrase results) are index-
        # content-dependent — drop them with the index caches
        self._searcher.__dict__.pop("_phrase_cache", None)
        self._searcher.__dict__.pop("_round_cache", None)

    def get(self, conv_id: str, turn_idx: int):
        """Fetch one document by natural key (≙ Result.from_id)."""
        return self.index.get_doc(conv_id, turn_idx)

    def search(self, queries: list[Query]) -> pd.DataFrame:
        import time as _time

        for q in queries:
            if len(q.q) > self.cfg.query_max_length:
                raise ValueError(
                    f"query too long ({len(q.q)} > {self.cfg.query_max_length})"
                )
        trace = []
        frames = []
        blocks = getattr(self.index, "_blocks", None)
        for q in queries:
            t0 = _time.perf_counter()
            b0 = len(blocks) if blocks is not None else 0
            # cold-path fan-out: read every query token's (and filter
            # key's) pruned blocks concurrently before the sequential
            # spec flow touches them one by one (analysis memoized so
            # warm repeats don't re-analyze for a no-op prefetch)
            if hasattr(self.index, "prefetch_tokens"):
                want = self._analyzed(q.q)
                if getattr(q, "filters", None):
                    want = list(want)
                    for col, vals in sorted(q.filters.items()):
                        for v in normalize_filter_values(
                            vals, self.cfg.max_filter_values
                        ):
                            want.append(f"f|{col}|{v}")
                self.index.prefetch_tokens(want)
            rdf = self._searcher.search([q])
            frames.append(rdf)
            entry = {
                "qid": q.qid,
                "seconds": round(_time.perf_counter() - t0, 4),
                "rows": int(len(rdf)),
            }
            if blocks is not None:
                entry["tokens_faulted"] = len(blocks) - b0
            trace.append(entry)
        self.last_trace = trace
        # empty-safe concat: zero queries (or all-empty results)
        # return the contract's empty-columns frame rather than
        # raising from pd.concat / tripping the all-NA FutureWarning
        nonempty = [f for f in frames if len(f)]
        if nonempty:
            return pd.concat(nonempty, ignore_index=True)
        if frames:
            return frames[0].iloc[0:0].reset_index(drop=True)
        return self._searcher.search([])
