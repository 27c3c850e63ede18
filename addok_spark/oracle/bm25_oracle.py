"""Single-process pure-Python/numpy oracle for the Spark engine.

Implements the EXACT same specification as
``addok_spark.query.engine.SearchEngine`` + ``index.build`` — same
analyzer functions (imported, not re-implemented), same weight
formula (``addok/helpers/index.py:30-37``), same collection rounds,
same BM25 expression tree evaluated in the same operand order, same
deterministic tie-breaks — so rank identity (north_rule) is checkable
with ``python -m pytest -x -q`` without trusting the system under
test. Candidate-set accumulation mirrors the engine line-for-line
(bucket semantics ≙ ``addok/core.py:354-365``).
"""

from __future__ import annotations

import math
from collections import defaultdict
from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..config import EngineConfig
from ..query.engine import FILTER_GID_BASE, normalize_filter_values
from ..functions.text import (
    analyze_str,
    edge_ngrams_str,
    fold_str,
    make_fuzzy_str,
    ref_fold_score,
    ref_string_score_best,
    str_distance_keys_multi,
)


@dataclass
class OracleResult:
    qid: str
    rows: pd.DataFrame  # rank, conv_id, turn_idx, score, boost, importance, doc_index


class ExpansionMixin:
    """Query-planning spec shared by the corpus-built OracleIndex and
    the parquet-backed serving index (serving/local.py): both expose
    ``cfg, df, max_boost, boost, fboost, have_pairs, cooc(),
    prefix_candidates()`` and inherit the expansion semantics below,
    so the serving tier follows the oracle's plan by construction."""

    def postings(self, token: str) -> dict[int, float]:
        """doc → boost for word tokens AND f| filter keys."""
        if token.startswith("f|"):
            return self.fboost.get(token, {})
        return self.boost.get(token, {})

    def posting_count(self, token: str) -> int:
        return len(self.postings(token))

    def tf_of(self, token: str, d: int) -> int:
        """Per-doc term frequency; 0 ⟺ token absent from doc."""
        return self.tf.get(token, {}).get(d, 0)

    def boost_of(self, token: str, d: int) -> float:
        """Per-doc posting boost (only called when tf_of > 0)."""
        return self.boost[token][d]

    def any_shared_docs(self, a: str, b: str) -> bool:
        """Do two tokens co-occur in at least one doc? (relation-
        extrapolation edge test, collectors.py:166-170)."""
        return bool(set(self.tf.get(a, {})) & set(self.tf.get(b, {})))

    def tf_boost_many(self, token: str, docs_sorted):
        """(tf, boost) arrays of one token over a sorted candidate
        array — tf 0 where the token misses the doc. Spec form: the
        per-doc point accessors; the serving tier overrides this with
        one block-pruned gather (serving/local.py), value-identical."""
        tfs = np.fromiter(
            (self.tf_of(token, int(d)) for d in docs_sorted),
            np.int64, len(docs_sorted),
        )
        boosts = np.fromiter(
            (
                self.boost_of(token, int(d)) if t else 0.0
                for d, t in zip(docs_sorted, tfs)
            ),
            np.float64, len(docs_sorted),
        )
        return tfs, boosts

    def folded_text(self, d: int) -> str:
        """Folded doc text for cream / reference-scorer / tie-break
        string comparisons (fold is deterministic, so implementations
        may cache it per doc)."""
        return fold_str(self.doc(d)["text"] or "")

    def folded_labels(self, d: int) -> list[str]:
        """Folded label VARIANTS of a doc: primary text plus the
        optional ``alt_text_field`` list (≙ reference Result.labels,
        results.py:80-104 — string comparisons score the BEST
        variant). Singleton (no alt column) ⇒ identical to
        ``folded_text`` alone, so the non-alt paths are unchanged."""
        labels = [self.folded_text(d)]
        alt_name = getattr(self.cfg, "alt_text_field", None)
        if alt_name:
            row = self.doc(d)
            alt = row.get(alt_name) if hasattr(row, "get") else None
            if alt is not None and not (
                isinstance(alt, float) and math.isnan(alt)
            ) and len(alt):
                labels.extend(fold_str(v or "") for v in alt)
        return labels

    # -- expansion helpers (mirror SearchEngine._plan_queries) -------------
    def noncommon(self, t: str) -> bool:
        return 0 < self.df.get(t, 0) <= self.cfg.common_threshold

    def prefix_expansions(
        self, prefix: str, others: list[str]
    ) -> list[tuple[str, int]]:
        """≙ autocomplete.py:83-95 + the engine's planning block:
        candidates co-occurring with every other meaningful token
        (commons exempt — the pair table drops the Zipf head), ordered
        by max posting score when the prefix is the only meaningful
        token (order_by_max_score.lua), by frequency otherwise."""
        cands = [c for c in self.prefix_candidates(prefix) if c != prefix]
        if others and self.have_pairs:
            cands = [
                c for c in cands
                if self.df.get(c, 0) > self.cfg.common_threshold
                or all(self.cooc(c, o) for o in others)
            ]
        if not others:
            cands.sort(
                key=lambda c: (-self.max_boost.get(c, 0.0),
                               -self.df.get(c, 0), c)
            )
        return [(c, self.df[c]) for c in cands[:10]]

    def fuzzy_expansions(
        self, token: str, others: list[str]
    ) -> list[tuple[str, int]]:
        """≙ try_fuzzy, fuzzy.py:70-117: neighbors in generation
        order; with other meaningful tokens present only neighbors
        co-occurring with ALL of them survive (SINTER over p| sets),
        else plain dictionary presence."""
        nbrs = make_fuzzy_str(token, self.cfg.fuzzy_key_map)
        if others and self.have_pairs:
            sel = [
                n for n in nbrs
                if self.df.get(n, 0) > 0
                and (self.df[n] > self.cfg.common_threshold
                     or all(self.cooc(n, o) for o in others))
            ]
        else:
            sel = [n for n in nbrs if self.df.get(n, 0) > 0]
        return [(n, self.df[n]) for n in sel[:8]]


class OracleIndex(ExpansionMixin):
    def __init__(self, corpus: pd.DataFrame, cfg: EngineConfig):
        self.cfg = cfg
        corpus = corpus.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        corpus["doc_index"] = np.arange(len(corpus), dtype=np.int64)
        self.docs = corpus
        # posting maps: token -> {doc: tf}, token -> {doc: boost}
        self.tf: dict[str, dict[int, int]] = defaultdict(dict)
        self.boost: dict[str, dict[int, float]] = defaultdict(dict)
        self.dl = np.zeros(len(corpus), dtype=np.int64)
        fields = [
            (f.name, f.boost, f.boost_col)
            for f in cfg.fields
            if f.name in corpus.columns
        ]
        # per-(token, doc) position lists in the concatenated field
        # token stream — same counter the index build packs into
        # pos_bin (phrase-mode positional matching)
        self.positions: dict[str, dict[int, list[int]]] = defaultdict(dict)
        syn, procs = cfg.synonyms, cfg.processors
        for row in corpus.itertuples(index=False):
            d = int(row.doc_index)
            imp = float(getattr(row, "importance", 0.0) or 0.0)
            fb: dict[str, float] = {}
            tfs: dict[str, int] = {}
            pos = 0
            segments = []
            for fi, (fname, fboost, bcol) in enumerate(fields):
                if bcol and bcol in corpus.columns:
                    # per-doc boost override (≙ callable boost)
                    bv = getattr(row, bcol, None)
                    if bv is not None and not (
                        isinstance(bv, float) and math.isnan(bv)
                    ):
                        fboost = float(bv)
                raw = getattr(row, fname)
                segments.append(
                    (
                        analyze_str(
                            raw if isinstance(raw, str) else "",
                            syn,
                            procs,
                        ),
                        fboost,
                    )
                )
                if fi == 0 and cfg.alt_text_field in corpus.columns:
                    # list-valued label variants right after the
                    # primary field (index build does the same)
                    alt = getattr(row, cfg.alt_text_field, None)
                    if alt is not None and not (
                        isinstance(alt, float) and math.isnan(alt)
                    ):
                        for v in alt:
                            segments.append(
                                (analyze_str(v or "", syn, procs), fboost)
                            )
            for toks, fboost in segments:
                if not toks:
                    continue
                w = cfg.default_boost / len(toks) * fboost
                for t in toks:
                    tfs[t] = tfs.get(t, 0) + 1
                    fb[t] = max(fb.get(t, 0.0), w)
                    self.positions[t].setdefault(d, []).append(pos)
                    pos += 1
            self.dl[d] = pos
            for t, c in tfs.items():
                self.tf[t][d] = c
                # engine stores boost as float32 in parquet
                self.boost[t][d] = float(
                    np.float32(fb[t] + imp * cfg.importance_weight)
                )
        self.df = {t: len(m) for t, m in self.tf.items()}
        # filter-set postings (f|name|value → {doc: 0.0}) — same
        # namespace as the engine's filter_token_rows (build.py)
        self.fboost: dict[str, dict[int, float]] = defaultdict(dict)
        for fname in cfg.filter_fields:
            if fname not in corpus.columns:
                continue
            for d, v in zip(corpus["doc_index"], corpus[fname]):
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    continue
                # list-valued filter fields: one f| posting per
                # element (build.py filter_token_rows ArrayType path)
                vals = v if isinstance(v, (list, tuple, np.ndarray)) else [v]
                for el in vals:
                    if el is None:
                        continue
                    # trim, drop empty — same normalization as
                    # build.py filter_token_rows and the query side
                    vv = str(el).strip()
                    if vv:
                        self.fboost[f"f|{fname}|{vv}"][int(d)] = 0.0
        self.n_docs = len(corpus)
        self.avgdl = float(self.dl.sum()) / max(self.n_docs, 1)
        # prefix table (non-digit tokens, autocomplete.py:111-131)
        self.prefixes: dict[str, list[tuple[str, int]]] = defaultdict(list)
        for t, df in self.df.items():
            if t.isdigit():
                continue
            for p in edge_ngrams_str(t, cfg.min_edge_ngram, cfg.max_edge_ngram):
                self.prefixes[p].append((t, df))
        # per-token max posting boost (float32 parity with the
        # dictionary's max_boost column, dictionary_from_blocks)
        self.max_boost = {
            t: max(m.values()) if m else 0.0 for t, m in self.boost.items()
        }
        # co-occurrence pairs of NON-common word tokens (mirror of
        # pairs_from_blocks: Zipf head dropped, sorted distinct pairs)
        self.have_pairs = cfg.build_pairs
        self.pairs: set[tuple[str, str]] = set()
        if self.have_pairs:
            per_doc: dict[int, list[str]] = defaultdict(list)
            for t, m in self.tf.items():
                if 0 < self.df[t] <= cfg.common_threshold:
                    for d in m:
                        per_doc[d].append(t)
            for ts in per_doc.values():
                ts.sort()
                for i, a in enumerate(ts):
                    for b in ts[i + 1:]:
                        self.pairs.add((a, b))

    def token_positions(self, token: str) -> dict[int, list[int]]:
        """doc → position list of one token (phrase mode)."""
        return self.positions.get(token, {})

    def doc(self, d: int):
        """Row accessor (supports ``row[col]`` / ``row.get``) — the
        serving tier overrides this with a pbucket-pruned parquet
        fetch (serving/local.py)."""
        return self.docs.iloc[d]

    def doc_len(self, d: int) -> int:
        return int(self.dl[d])

    def cooc(self, a: str, b: str) -> bool:
        return a != b and (min(a, b), max(a, b)) in self.pairs

    def prefix_candidates(self, prefix: str, cap: int = 100) -> list[str]:
        """Raw df-desc candidates under a prefix (≙ SMEMBERS n|prefix
        + the engine's _prefix_candidates_batch driver cap)."""
        cands = sorted(self.prefixes.get(prefix, []), key=lambda x: (-x[1], x[0]))
        return [t for t, _ in cands[:cap]]


class SpecSearch:
    """Per-query search flow over an OracleIndex-shaped index object:
    planning, collection rounds, relaxation, relation extrapolation,
    cream early-termination, scoring — the executable spec the Spark
    engine is rank-identity tested against.  The serving tier
    (serving/local.py) subclasses this and overrides only the hot
    ``run_gids`` collection kernel with a numpy-vectorized version;
    every other line of the flow is shared, so the two paths cannot
    drift in semantics."""

    def __init__(self, index, cfg: EngineConfig):
        self.index = index
        self.cfg = cfg

    # -- hot kernel (overridable) ------------------------------------------
    def run_gids(
        self,
        groups: dict[int, list[str]],
        group_dfs: dict[int, int],
        gids: list[int],
        bucket_limit: int,
        use_scan: bool = True,
    ) -> list[int]:
        """Conjunctive group match + Σboost top-bucket_max (same
        spec as SearchEngine._run_round incl. manual_scan)."""
        index, cfg = self.index, self.cfg
        scan_docs = None
        if use_scan and all(
            group_dfs.get(g, 0) > cfg.intersect_limit for g in gids
        ):
            sgid = min(gids, key=lambda g: (group_dfs.get(g, 0), g))
            sboost: dict[int, float] = {}
            for tok in groups[sgid]:
                for d, b in index.postings(tok).items():
                    if d not in sboost or b > sboost[d]:
                        sboost[d] = b
            ordered_s = sorted(sboost.items(), key=lambda kv: (-kv[1], kv[0]))
            scan_docs = {d for d, _ in ordered_s[: cfg.scan_limit]}
        match: dict[int, dict[int, float]] = {}  # doc -> gid -> gboost
        for gid in gids:
            for tok in groups[gid]:
                for d, b in index.postings(tok).items():
                    if scan_docs is not None and d not in scan_docs:
                        continue
                    slot = match.setdefault(d, {})
                    slot[gid] = max(slot.get(gid, -math.inf), b)
        hits = []
        for d, per_gid in match.items():
            if len(per_gid) >= len(gids):
                pre = 0.0
                for gid in sorted(per_gid):
                    pre += float(per_gid[gid])
                hits.append((-pre, d))
        hits.sort()
        return [d for _, d in hits[:bucket_limit]]

    # -- per-query flow ------------------------------------------------------
    def phrase_occurrences(self, seq: list[str]) -> dict[int, int]:
        """doc → number of consecutive-in-order occurrences of the
        analyzed token sequence (positional anchor intersection: a
        token at position p matching sequence offset o anchors a
        phrase start at p-o; the phrase occurs at every anchor all
        offsets share). Pure-dict spec; the serving tier overrides
        with a vectorized twin."""
        index = self.index
        per_doc: dict[int, set[int]] | None = None
        for off, t in enumerate(seq):
            cur = {
                d: {int(p) - off for p in ps}
                for d, ps in index.token_positions(t).items()
            }
            if per_doc is None:
                per_doc = cur
            else:
                per_doc = {
                    d: per_doc[d] & s for d, s in cur.items() if d in per_doc
                }
            per_doc = {d: s for d, s in per_doc.items() if s}
            if not per_doc:
                return {}
        return {d: len(s) for d, s in (per_doc or {}).items()}

    def phrase_candidates(
        self, seq: list[str], filter_docsets: list[set[int]], bucket_limit: int
    ) -> list[int]:
        """Phrase candidate doc ids ordered (-occurrences, doc),
        filter-set constrained BEFORE the cap. Pure-dict spec; the
        serving tier overrides with a twin that caches the ORDERED
        match arrays, so a repeat phrase pays a slice instead of
        re-sorting a possibly corpus-scale match map."""
        matched = self.phrase_occurrences(seq)
        for fdocs in filter_docsets:
            matched = {d: c for d, c in matched.items() if d in fdocs}
        ordered = sorted(matched.items(), key=lambda kv: (-kv[1], kv[0]))
        return [d for d, _ in ordered[:bucket_limit]]

    def _one(self, q) -> pd.DataFrame | None:
        index, cfg = self.index, self.cfg
        is_phrase = bool(getattr(q, "phrase", False))
        seq = analyze_str(q.q, cfg.synonyms, cfg.processors)  # ordered, duplicates kept
        toks = seq
        seen: set[str] = set()
        toks = [t for t in toks if not (t in seen or seen.add(t))]
        groups: dict[int, list[str]] = {}
        group_dfs: dict[int, int] = {}
        meaningful: list[tuple[int, int, str]] = []
        for gid, tok in enumerate(toks):
            df = index.df.get(tok, 0)
            last = gid == len(toks) - 1
            if is_phrase:
                # phrase mode: no expansions ever — singleton groups
                # for scoring; a df-0 token just can't match
                groups[gid] = [tok]
                group_dfs[gid] = df
                if 0 < df <= cfg.common_threshold:
                    meaningful.append((df, gid, tok))
                continue
            if df == 0 or (getattr(q, "autocomplete", False) and last):
                exp: list[tuple[str, int]] = [(tok, df)] if df > 0 else []
                if getattr(q, "autocomplete", False) and last:
                    others = [t for t in toks[:-1] if index.noncommon(t)]
                    exp += index.prefix_expansions(tok, others)
                if not exp:
                    others_f = [
                        t for t in toks if t != tok and index.noncommon(t)
                    ]
                    exp = index.fuzzy_expansions(tok, others_f)
                if exp:
                    groups[gid] = [t for t, _ in exp]
                    group_dfs[gid] = min(d for _, d in exp)
                    meaningful.append((group_dfs[gid], gid, tok))
            elif df > cfg.common_threshold:
                groups[gid] = [tok]
                group_dfs[gid] = df
            else:
                groups[gid] = [tok]
                group_dfs[gid] = df
                meaningful.append((df, gid, tok))
        meaningful.sort(key=lambda x: (x[0], x[2]))
        order = [gid for _, gid, _ in meaningful[: cfg.max_meaningful]]

        # no usable word tokens -> abort guard (collectors.py:10-17)
        if not groups:
            return None
        # filter groups (mirror engine FILTER_GID_BASE semantics)
        filter_gids: list[int] = []
        for fi, (fcol, vals) in enumerate(
            sorted((getattr(q, "filters", None) or {}).items())
        ):
            vs = normalize_filter_values(vals, cfg.max_filter_values)
            if vs:
                gid = FILTER_GID_BASE + fi
                keys = [f"f|{fcol}|{v}" for v in vs]
                groups[gid] = keys
                group_dfs[gid] = min(index.posting_count(k) for k in keys)
                filter_gids.append(gid)

        candidates: set[int] = set()
        done = False
        qf = fold_str(q.q)
        # per-query bucket limit = max(k, BUCKET_MAX) (reference
        # core.py:339 / issue #422)
        bucket_limit = max(cfg.bucket_max, int(getattr(q, "k", 0) or 0))

        cream_memo: dict[int, float] = {}

        def has_cream() -> bool:
            # ≙ core.py:400-419 (mirror of SearchEngine._apply_cream):
            # the metric is the reference result processors'
            # str_distance (autocomplete ladder / compare_ngrams per
            # query mode, results.py:60-104), not the tie-break key.
            # Memoized per doc: rounds re-test the same accumulated
            # candidates and the metric is deterministic per query.
            ac = bool(getattr(q, "autocomplete", False))

            def _m(d: int) -> float:
                v = cream_memo.get(d)
                if v is None:
                    v = ref_string_score_best(
                        qf, index.folded_labels(d), ac
                    )
                    cream_memo[d] = v
                return v

            return any(
                _m(d) >= cfg.match_threshold for d in sorted(candidates)
            )

        def removal_order() -> list[int]:
            # ≙ collectors.py:127-131 (mirror of engine removal_order)
            return sorted(
                order,
                key=lambda g: (
                    1 if groups[g][0].isdigit() else 0,
                    group_dfs.get(g, 0),
                ),
                reverse=True,
            )

        if is_phrase:
            # candidates = positional phrase matches, filter-set
            # constrained BEFORE the cap, ordered (-occurrences, doc)
            if seq and all(index.df.get(t, 0) > 0 for t in seq):
                fsets: list[set[int]] = []
                for gid in filter_gids:
                    fdocs: set[int] = set()
                    for fk in groups[gid]:
                        fdocs |= set(index.postings(fk))
                    fsets.append(fdocs)
                candidates.update(
                    self.phrase_candidates(seq, fsets, bucket_limit)
                )
            done = True

        for round_no in (1, 3, 4):
            if done:
                break
            if round_no >= 3 and candidates and has_cream():
                done = True
                break
            variants: list[list[int]] = []
            if round_no == 1:
                # meaningful conjunction or commons fallback (mirror
                # of the engine's merged round 1)
                gids = order if order else [
                    g for g in sorted(groups) if g < FILTER_GID_BASE
                ]
                if gids:
                    variants = [gids]
            elif round_no == 3 and len(order) > 1:
                # remove-1 relaxation (collectors.py:115-137 mirror)
                n_tok = len([g for g in groups if g < FILTER_GID_BASE])
                smt = math.ceil(2.0 / 3.0 * n_tok)
                if not candidates or len(order) - 1 > smt:
                    variants = [
                        [g for g in order if g != r] for r in removal_order()
                    ]
            elif round_no == 4 and len(order) > 3 and not candidates:
                rm = removal_order()
                for i, a in enumerate(rm):
                    for b2 in rm[i + 1:]:
                        variants.append(
                            [g for g in order if g not in (a, b2)]
                        )
            for gids in variants:
                if not gids:
                    continue
                room = max(0, bucket_limit - len(candidates))
                if room == 0:
                    break
                ordered = self.run_gids(
                    groups, group_dfs, gids + filter_gids, bucket_limit
                )
                candidates.update(ordered[:room])
            if variants and len(candidates) >= cfg.bucket_min:
                done = True

        # round 5: relation extrapolation (Q13, collectors.py:151-214)
        # — mirror of SearchEngine._relation_round
        if not done and candidates and has_cream():
            done = True
        if not done and len(order) >= 3:
            from ..query.cliques import ordered_cliques

            r = {g: groups[g][0] for g in order}
            edges = set()
            for i in order:
                for j in order:
                    if i < j:
                        ta, tb = r[i], r[j]
                        if (
                            0 < index.df.get(ta, 0) <= cfg.common_threshold
                            and 0 < index.df.get(tb, 0) <= cfg.common_threshold
                            and index.any_shared_docs(ta, tb)
                        ):
                            edges.add((i, j))
            for clique in ordered_cliques(order, edges, group_dfs):
                if len(candidates) >= cfg.bucket_min:
                    break
                ordered = self.run_gids(
                    groups, group_dfs, list(clique) + filter_gids,
                    bucket_limit, use_scan=False,
                )
                room = max(0, bucket_limit - len(candidates))
                candidates.update(ordered[:room])

        # --- scoring over FULL group set (same expression tree) ----------
        k1, b = cfg.bm25_k1, cfg.bm25_b
        n_docs, avgdl = index.n_docs, index.avgdl
        recs = []
        filters = getattr(q, "filters", None) or {}
        cand_sorted = sorted(candidates)
        # one bulk (tf, boost) gather per scoring token over the whole
        # candidate array — the inner fold below reads positions from
        # these instead of per-(token, doc) point lookups, with the
        # identical scalar float path (gather is just data movement)
        cand_arr = np.array(cand_sorted, dtype=np.int64)
        gathered: dict[tuple[int, str], tuple] = {}
        if len(cand_arr):
            for gid in sorted(groups):
                if gid >= FILTER_GID_BASE:
                    continue
                for tok in groups[gid]:
                    gathered[(gid, tok)] = index.tf_boost_many(tok, cand_arr)
        for ci, d in enumerate(cand_sorted):
            doc = index.doc(d)
            ok = True
            for col, vals in filters.items():
                vs = set(normalize_filter_values(vals, cfg.max_filter_values))
                if not vs:
                    continue
                dv = doc[col]
                # list-valued field matches when ANY element matches
                els = dv if isinstance(dv, (list, tuple, np.ndarray)) else [dv]
                if not any(
                    el is not None and str(el).strip() in vs for el in els
                ):
                    ok = False
            if not ok:
                continue
            score = 0.0
            boost_sum = 0.0
            matched_any = False
            for gid in sorted(groups):
                if gid >= FILTER_GID_BASE:
                    continue  # filter groups never score
                tf = 0
                dfm = None
                gboost = None
                for tok in groups[gid]:
                    g_tf, g_b = gathered[(gid, tok)]
                    tfv = int(g_tf[ci])
                    if tfv:
                        tf += tfv
                        tdf = index.df[tok]
                        dfm = tdf if dfm is None else min(dfm, tdf)
                        tb = float(g_b[ci])
                        gboost = tb if gboost is None else max(gboost, tb)
                if tf == 0:
                    continue
                matched_any = True
                idf = math.log(1.0 + (float(n_docs) - dfm + 0.5) / (dfm + 0.5))
                tfn = tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * float(index.doc_len(d)) / avgdl))
                score += idf * tfn
                boost_sum += float(gboost)
            if not matched_any:
                continue
            if cfg.scorer == "reference":
                score = ref_fold_score(
                    float(doc.get("importance", 0.0) or 0.0),
                    ref_string_score_best(
                        qf, index.folded_labels(d),
                        bool(getattr(q, "autocomplete", False)),
                    ),
                    cfg.importance_weight,
                )
                if score < cfg.min_score:
                    continue
            recs.append(
                {
                    "qid": q.qid,
                    "doc_index": d,
                    "score": score,
                    # str_distance filled in one batched DP below
                    "str_distance": 0.0,
                    "boost": boost_sum,
                    "importance": float(doc.get("importance", 0.0) or 0.0),
                    "conv_id": doc["conv_id"],
                    "turn_idx": int(doc["turn_idx"]),
                    # render fields (≙ engine.search's doc join) so
                    # serving/HTTP can answer without a second fetch
                    "role": doc.get("role"),
                    "tool": doc.get("tool"),
                    "text": doc["text"],
                }
            )
        if recs:
            # deterministic secondary sort key, one vectorized DP
            # (bit-equal to per-pair str_distance_key) — computed ONLY
            # for candidates whose score reaches the k-th score: the
            # primary sort key is score, so a candidate strictly below
            # the k-th score can never enter the top-k whatever its
            # tie-break, and the DP is the scoring stage's single
            # largest cost at ~10× more candidates than k
            k = int(getattr(q, "k", 0) or 0)
            if 0 < k < len(recs):
                sc = np.array([r["score"] for r in recs], dtype=np.float64)
                kth = np.partition(sc, len(sc) - k)[len(sc) - k]
                sel = np.flatnonzero(sc >= kth)
            else:
                sel = np.arange(len(recs))
            dists = str_distance_keys_multi(
                qf, [index.folded_labels(recs[i]["doc_index"]) for i in sel]
            )
            for i, dv in zip(sel, dists):
                recs[i]["str_distance"] = dv
        if not recs:
            return None
        # total order (score desc, str_distance desc, boost desc,
        # importance desc, doc_index asc) via one lexsort on the key
        # arrays; only the top-k records become a frame (a per-query
        # sort_values over a 5-key candidate-sized DataFrame was a
        # measured chunk of warm serving latency)
        order = np.lexsort((
            np.array([r["doc_index"] for r in recs], dtype=np.int64),
            -np.array([r["importance"] for r in recs], dtype=np.float64),
            -np.array([r["boost"] for r in recs], dtype=np.float64),
            -np.array([r["str_distance"] for r in recs], dtype=np.float64),
            -np.array([r["score"] for r in recs], dtype=np.float64),
        ))[: q.k]
        rdf = pd.DataFrame(
            [recs[i] for i in order], columns=list(recs[0].keys())
        )
        rdf["rank"] = np.arange(1, len(rdf) + 1)
        return rdf

    def search(self, queries: list) -> pd.DataFrame:
        rows_out = []
        for q in queries:
            rdf = self._one(q)
            if rdf is not None:
                rows_out.append(rdf)
        if not rows_out:
            return pd.DataFrame(
                columns=["qid", "doc_index", "score", "str_distance", "boost",
                         "importance", "conv_id", "turn_idx", "role", "tool",
                         "text", "rank"]
            )
        return pd.concat(rows_out, ignore_index=True)


def oracle_search(
    index: OracleIndex,
    queries: list,  # objects with qid, q, k, autocomplete, filters
    cfg: EngineConfig,
) -> pd.DataFrame:
    return SpecSearch(index, cfg).search(queries)
