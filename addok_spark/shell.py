"""Interactive shell over a built index (≙ the reference's REPL,
``/root/reference/addok/shell.py`` — same command surface recast over
the Spark engine; the heavyweight EXPLAIN logic already lives in the
engine's ``last_trace`` and is shared with ``python -m addok_spark
explain``).

Commands (case-insensitive; anything else is a SEARCH):
    <free text>            search the index
    EXPLAIN <q>            search + per-stage timings and token groups
    BUCKET <q>             search returning the WHOLE collected bucket
    BENCH [n] <q>          repeat a search n times (default 10), p50/p95
    INTERSECT <toks> [LIMIT n]  raw conjunctive Σboost top-n (≙ zinter)
    PAIR <token>           tokens co-occurring with token (p| set view)
    BESTSCORE <word>       top docs of a token by posting boost
    GET <conv_id> <turn>   fetch one document by natural key
    STRDISTANCE <a>|<b>    string comparison score (≙ compare_str)
    TOKENIZE <q>           analyzer output (fold + synonyms + tokens)
    FUZZY <word>           edit-1 neighbors in reference emission order
    FREQ <token> [...]     document frequency of token(s)
    AUTOCOMPLETE [on|off]  toggle last-token prefix expansion
    FILTERS [json|off]     set session filters, e.g. {"role": ["user"]}
    K <n>                  result count per query
    DBINFO                 index stats (≙ shell DBINFO)
    DBKEY <key>            raw index key view: w|tok p|tok f|col|val d|id
    INDEX <conv_id> <turn> per-token boost + posting rank for one doc
    CONFIG [name]          inspect engine config (all keys or one)
    HELP                   this help
    QUIT / EXIT            leave

One SparkSession + SearchEngine is reused across commands, so repeat
queries are warm (first query pays Spark job-server warm-up).
"""

from __future__ import annotations

import json
import shlex
import time


HELP = __doc__.split("Commands", 1)[1]


class Shell:
    def __init__(self, spark, index_dir: str, cfg):
        from .query.engine import SearchEngine

        self.spark = spark
        self.cfg = cfg
        self.engine = SearchEngine(spark, index_dir, cfg)
        self.index_dir = index_dir
        self.autocomplete = False
        self.filters: dict[str, list[str]] = {}
        self.k = 10
        self.qid = 0

    # -- search-line grammar (≙ reference shell.py:146-205) ------------------
    @staticmethod
    def _match_option(key: str, string: str):
        """One ``KEY value`` / ``KEY=value`` occurrence removed from
        the line (hardened vs the reference's findall+replace: the
        key must start at a word boundary so 'PAROLE officer' is not
        a ROLE filter, only the matched span is removed so a value
        containing the key survives, and a bare trailing key is left
        as search text)."""
        import re

        m = re.search(r"(?<!\w){}[= ]([^ ]*)".format(re.escape(key)), string)
        if not m or not m.group(1):
            return string.strip(), None
        return (
            (string[: m.start()] + string[m.end():]).strip(),
            m.group(1),
        )

    def _parse_filters(self, query: str):
        """Inline ``ROLE user`` / ``TOOL bash`` filter tokens in a
        SEARCH line; repetition (``ROLE a ROLE b``) and pipe
        separator (``ROLE a|b``) both OR (≙ reference
        _parse_filters, shell.py:155-205)."""
        filters: dict[str, list[str]] = {}
        for name in self.cfg.filter_fields:
            values: list[str] = []
            while True:
                query, v = self._match_option(name.upper(), query)
                if v is None:
                    break
                # empty segments from doubled separators (a||b) are
                # ignored, values whitespace-stripped (≙ reference
                # shell.py separator handling)
                values.extend(s for s in (x.strip() for x in v.split("|")) if s)
            if values:
                filters[name] = values
        return query, filters

    # -- commands -----------------------------------------------------------
    def do_search(self, q: str, explain: bool = False) -> str:
        from .query.engine import FILTER_GID_BASE, Query

        self.qid += 1
        qid = f"sh{self.qid}"
        # inline options override session state for this query only;
        # a non-numeric or missing value leaves the word as search
        # text ('RATE LIMIT exceeded' is a query, not an option)
        k, autocomplete = self.k, self.autocomplete
        if "AUTOCOMPLETE" in q:
            q2, v = self._match_option("AUTOCOMPLETE", q)
            if v is not None and v.isdigit():
                q, autocomplete = q2, bool(int(v))
        if "LIMIT" in q:
            q2, v = self._match_option("LIMIT", q)
            if v is not None and v.isdigit():
                q, k = q2, int(v)
        q, inline_filters = self._parse_filters(q)
        # per-field merge: an inline ROLE overrides the session's
        # role filter but leaves other session filters standing
        # (same per-option semantics as LIMIT / AUTOCOMPLETE)
        filters = {**self.filters, **inline_filters}
        t0 = time.time()
        res = self.engine.search(
            [Query(qid=qid, q=q, k=k,
                   autocomplete=autocomplete, filters=filters)]
        ).collect()
        dt = time.time() - t0
        out = []
        for r in res:
            out.append(
                f"{r['rank']:>3}  {r['score']:.4f}  "
                f"{r['conv_id']}#{r['turn_idx']} [{r['role']}] {r['text'][:90]}"
            )
        out.append(f"({len(res)} hits in {dt:.2f}s)")
        if explain:
            st = self.engine.last_states[qid]
            for gid, toks in sorted(st.groups.items()):
                kind = (
                    "filter" if gid >= FILTER_GID_BASE
                    else "meaningful" if gid in st.meaningful_order
                    else "common"
                )
                out.append(
                    f"  group {gid} [{kind}] df={st.group_df.get(gid)} "
                    f"tokens={toks}"
                )
            for stage in self.engine.last_trace:
                out.append(f"  {json.dumps(stage)}")
        return "\n".join(out)

    def do_tokenize(self, q: str) -> str:
        from .functions.text import analyze_str, fold_str

        return (
            f"folded: {fold_str(q)}\n"
            f"tokens: {analyze_str(q, self.cfg.synonyms, self.cfg.processors)}"
        )

    def do_fuzzy(self, word: str) -> str:
        from .functions.text import make_fuzzy_str

        return str(make_fuzzy_str(word.strip(), self.cfg.fuzzy_key_map))

    def do_freq(self, arg: str) -> str:
        toks = shlex.split(arg)
        stats = self.engine._token_stats(set(toks))
        return "\n".join(
            f"{t}: df={stats.get(t, (0, 0.0))[0]}" for t in toks
        )

    def do_intersect(self, arg: str) -> str:
        """Raw conjunctive Σboost top-n over exact tokens, bypassing
        planning/relaxation (≙ shell INTERSECT → ZINTERSTORE +
        ZREVRANGE, reference shell.py:291-307)."""
        from pyspark.sql import functions as F

        from .functions.text import analyze_str

        import re

        limit = 100
        m = re.search(r"\s+LIMIT\s+(\d+)\s*$", arg, re.I)
        if m:
            limit = int(m.group(1))
            arg = arg[: m.start()]
        toks = analyze_str(arg, self.cfg.synonyms, self.cfg.processors)
        if not toks:
            return "(no tokens)"
        t0 = time.time()
        plan_rows = [
            {"qid": "ix", "gid": g, "token": t, "n_required": len(set(toks)),
             "is_scan": False}
            for g, t in enumerate(dict.fromkeys(toks))
        ]
        import pandas as pd

        got = self.engine._run_round(pd.DataFrame(plan_rows), topn=limit)
        if not len(got):
            return "(0 in %.2fs)" % (time.time() - t0)
        ids = [int(d) for d in got["doc_index"]]
        rows = {
            r["doc_index"]: r
            for r in self.engine.docs.filter(
                F.col("doc_index").isin(ids)
            ).collect()
        }
        out = [
            f"{r.rn:>3}  {r.prescore:.4f}  "
            f"{rows[r.doc_index]['conv_id']}#{rows[r.doc_index]['turn_idx']} "
            f"{(rows[r.doc_index]['text'] or '')[:80]}"
            for r in got.itertuples(index=False)
        ]
        out.append(f"({len(got)} in {time.time() - t0:.2f}s)")
        return "\n".join(out)

    def do_pair(self, token: str) -> str:
        """Tokens co-occurring with ``token`` (≙ inspecting the p|
        set; served from the pairs table, commons excluded by
        design)."""
        from pyspark.sql import functions as F

        from .functions.text import analyze_str

        toks = analyze_str(token, self.cfg.synonyms, self.cfg.processors)
        if not toks:
            return "(no token)"
        t = toks[0]
        if self.engine.pairs is None:
            return "(no pairs table)"
        rows = (
            self.engine.pairs.filter(
                (F.col("token_a") == t) | (F.col("token_b") == t)
            )
            .select("token_a", "token_b")
            .collect()
        )
        others = sorted(
            {r["token_b"] if r["token_a"] == t else r["token_a"] for r in rows}
        )
        return f"{t}: {len(others)} pairs\n" + ", ".join(others[:100])

    def do_bestscore(self, word: str) -> str:
        """Top docs of one token by posting boost (≙ BESTSCORE →
        ZREVRANGE WITHSCORES, reference shell.py:469-476)."""
        from pyspark.sql import functions as F

        from .functions.text import analyze_str
        from .query.engine import _exploded_postings

        toks = analyze_str(word, self.cfg.synonyms, self.cfg.processors)
        if not toks:
            return "(no token)"
        t = toks[0]
        posts = (
            _exploded_postings(
                self.engine.blocks.filter(F.col("token") == t), []
            )
            .orderBy(F.desc("boost"), F.asc("doc_index"))
            .limit(20)
            .collect()
        )
        if not posts:
            return f"{t}: no postings"
        ids = [int(r["doc_index"]) for r in posts]
        rows = {
            r["doc_index"]: r
            for r in self.engine.docs.filter(
                F.col("doc_index").isin(ids)
            ).collect()
        }
        return "\n".join(
            f"{r['boost']:.4f}  {rows[r['doc_index']]['conv_id']}"
            f"#{rows[r['doc_index']]['turn_idx']} "
            f"{(rows[r['doc_index']]['text'] or '')[:80]}"
            for r in posts
        )

    def do_get(self, arg: str) -> str:
        """One document by natural key (≙ GET, shell.py:421-430)."""
        from pyspark.sql import functions as F

        parts = shlex.split(arg)
        if len(parts) != 2:
            return "usage: GET <conv_id> <turn_idx>"
        rows = self.engine.docs.filter(
            (F.col("conv_id") == parts[0])
            & (F.col("turn_idx") == int(parts[1]))
        ).collect()
        if not rows:
            return f'id "{arg}" not found'
        r = rows[0]
        return "\n".join(f"{k} {r[k]}" for k in r.asDict())

    def do_strdistance(self, arg: str) -> str:
        """≙ STRDISTANCE (shell.py:523-532): compare_str on the two
        |-separated strings."""
        from .functions.text import compare_str

        parts = arg.split("|")
        if len(parts) != 2:
            return "Malformed string. Use | between the two strings."
        return str(compare_str(parts[0], parts[1]))

    def do_bench(self, arg: str) -> str:
        """≙ BENCH (shell.py:282-289): repeat a search, report p50/p95."""
        from .query.engine import Query

        parts = arg.split(None, 1)
        count, q = 10, arg
        if parts and parts[0].isdigit():
            count, q = int(parts[0]), (parts[1] if len(parts) > 1 else "")
        if not q.strip():
            return "usage: BENCH [n] <query>"
        times = []
        for i in range(count):
            self.qid += 1
            t0 = time.time()
            self.engine.search(
                [Query(qid=f"b{self.qid}", q=q, k=self.k,
                       autocomplete=self.autocomplete, filters=self.filters)]
            ).collect()
            times.append(time.time() - t0)
        times.sort()
        return (
            f"n={count} p50={times[len(times) // 2]:.3f}s "
            f"p95={times[min(len(times) - 1, int(len(times) * 0.95))]:.3f}s "
            f"best={times[0]:.3f}s"
        )

    def do_config(self, name: str) -> str:
        """≙ CONFIG (reference shell.py:533-545): dump the loaded
        config, or one key."""
        import dataclasses

        items = {
            f.name: getattr(self.cfg, f.name)
            for f in dataclasses.fields(self.cfg)
        }
        name = name.strip().lower()
        if name:
            if name not in items:
                return f"{name} Not found."
            return f"{name} {items[name]!r}"
        return "\n".join(f"{k} {v!r}" for k, v in sorted(items.items()))

    def do_dbkey(self, key: str) -> str:
        """≙ DBKEY (reference shell.py:329-340): print the raw content
        behind one index key. Reference key grammar kept: ``w|token``
        (postings), ``p|token`` (pair set), ``f|col|val`` (filter
        postings), ``d|conv_id|turn`` (document row)."""
        from pyspark.sql import functions as F

        key = key.strip()
        kind, _, rest = key.partition("|")
        if kind == "w" and rest:
            stats = self.engine._token_stats({rest})
            if rest not in stats:
                return f"type: none\nvalue: (no such token) {rest}"
            df, mx = stats[rest]
            nb = self.engine.blocks.filter(F.col("token") == rest).count()
            return (
                f"type: postings\n"
                f"value: token={rest} df={df} max_boost={mx:.4f} blocks={nb}"
            )
        if kind == "p" and rest:
            return f"type: set\nvalue:\n{self.do_pair(rest)}"
        if kind == "f" and rest:
            stats = self.engine._token_stats({key})
            if key not in stats:
                return f"type: none\nvalue: (no such filter key) {key}"
            return f"type: postings\nvalue: key={key} df={stats[key][0]}"
        if kind == "d" and rest:
            conv, _, turn = rest.partition("|")
            return f"type: hash\nvalue:\n{self.do_get(f'{conv} {turn or 0}')}"
        return f"Unsupported key type {kind!r} (use w| p| f| d|)"

    def do_index(self, arg: str) -> str:
        """≙ INDEX (reference shell.py:458-467): per-token index
        details for one document — each indexed token's boost for this
        doc and the doc's rank inside that token's postings (the
        reference's ZSCORE + ZREVRANK pair)."""
        from pyspark.sql import functions as F

        parts = shlex.split(arg)
        if len(parts) != 2:
            return "usage: INDEX <conv_id> <turn_idx>"
        rows = self.engine.docs.filter(
            (F.col("conv_id") == parts[0])
            & (F.col("turn_idx") == int(parts[1]))
        ).collect()
        if not rows:
            return f'id "{arg}" not found'
        doc = rows[0]
        di = int(doc["doc_index"])
        from .functions.text import analyze_str
        from .query.engine import _exploded_postings

        toks: list[str] = []
        for f_spec in self.cfg.fields:
            val = doc[f_spec.name] if f_spec.name in doc.asDict() else None
            if not val:
                continue
            vals = val if isinstance(val, (list, tuple)) else [val]
            for v in vals:
                toks.extend(
                    analyze_str(str(v), self.cfg.synonyms,
                                self.cfg.processors)
                )
        toks = list(dict.fromkeys(toks))
        if not toks:
            return "(no indexed tokens)"
        exploded = _exploded_postings(
            self.engine.blocks.filter(F.col("token").isin(toks)), ["token"]
        ).select("token", "doc_index", "boost")
        mine = exploded.filter(F.col("doc_index") == di).select(
            F.col("token"), F.col("boost").alias("my_boost")
        )
        # rank ≙ ZREVRANK: postings strictly ahead of this doc in the
        # (boost desc, doc_index asc) total order — one join + agg, no
        # full-postings collect
        ranked = (
            exploded.join(F.broadcast(mine), "token")
            .groupBy("token", "my_boost")
            .agg(
                F.sum(
                    (
                        (F.col("boost") > F.col("my_boost"))
                        | (
                            (F.col("boost") == F.col("my_boost"))
                            & (F.col("doc_index") < F.lit(di))
                        )
                    ).cast("int")
                ).alias("rank")
            )
            .collect()
        )
        by_tok = {r["token"]: r for r in ranked}
        out = []
        for t in toks:
            r = by_tok.get(t)
            if r is None:
                out.append(f"{t} (not indexed)")
            else:
                out.append(f"{t} {float(r['my_boost']):.4f} {int(r['rank'])}")
        return "\n".join(out)

    def do_dbinfo(self) -> str:
        from pyspark.sql import functions as F

        agg = self.engine.blocks.agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum("n").alias("n_postings"),
            F.countDistinct("token").alias("n_tokens"),
        ).collect()[0]
        return json.dumps(
            {**self.engine.meta, **{k: int(agg[k]) for k in agg.asDict()}},
            indent=2,
        )

    # -- dispatch -----------------------------------------------------------
    def dispatch(self, line: str) -> str | None:
        line = line.strip()
        if not line:
            return None
        word, _, rest = line.partition(" ")
        cmd = word.upper()
        if cmd in ("QUIT", "EXIT"):
            raise EOFError
        if cmd == "HELP":
            return HELP
        if cmd == "EXPLAIN":
            return self.do_search(rest, explain=True)
        if cmd == "BUCKET":
            # whole collected bucket, not just k (≙ do_BUCKET)
            k0, self.k = self.k, max(self.cfg.bucket_max, self.k)
            try:
                return self.do_search(rest)
            finally:
                self.k = k0
        if cmd == "BENCH":
            return self.do_bench(rest)
        if cmd == "INTERSECT":
            return self.do_intersect(rest)
        if cmd == "PAIR":
            return self.do_pair(rest)
        if cmd == "BESTSCORE":
            return self.do_bestscore(rest)
        if cmd == "GET":
            return self.do_get(rest)
        if cmd == "STRDISTANCE":
            return self.do_strdistance(rest)
        if cmd == "TOKENIZE":
            return self.do_tokenize(rest)
        if cmd == "FUZZY":
            return self.do_fuzzy(rest)
        if cmd == "FREQ":
            return self.do_freq(rest)
        if cmd == "DBINFO":
            return self.do_dbinfo()
        if cmd == "DBKEY":
            return self.do_dbkey(rest)
        if cmd == "INDEX":
            return self.do_index(rest)
        if cmd == "CONFIG":
            return self.do_config(rest)
        if cmd == "AUTOCOMPLETE":
            if rest.strip().lower() in ("on", "off"):
                self.autocomplete = rest.strip().lower() == "on"
            else:
                self.autocomplete = not self.autocomplete
            return f"autocomplete: {'on' if self.autocomplete else 'off'}"
        if cmd == "FILTERS":
            r = rest.strip()
            if r.lower() in ("off", "none", ""):
                self.filters = {}
            else:
                self.filters = json.loads(r)
            return f"filters: {json.dumps(self.filters)}"
        if cmd == "K":
            self.k = int(rest.strip())
            return f"k: {self.k}"
        return self.do_search(line)

    def loop(self) -> None:  # pragma: no cover - interactive
        try:
            import readline  # noqa: F401  (history/editing if available)
        except ImportError:
            pass
        print("addok_spark shell — HELP for commands, QUIT to leave")
        while True:
            try:
                line = input("addok> ")
            except (EOFError, KeyboardInterrupt):
                print()
                return
            try:
                out = self.dispatch(line)
            except EOFError:
                return
            except Exception as e:  # keep the REPL alive on bad input
                out = f"error: {e}"
            if out:
                print(out)
