"""Interactive shell over a built index (≙ the reference's REPL,
``/root/reference/addok/shell.py`` — same command surface recast over
the Spark engine; the heavyweight EXPLAIN logic already lives in the
engine's ``last_trace`` and is shared with ``python -m addok_spark
explain``).

Commands (case-insensitive; anything else is a SEARCH):
    <free text>            search the index
    EXPLAIN <q>            search + per-stage timings and token groups
    TOKENIZE <q>           analyzer output (fold + synonyms + tokens)
    FUZZY <word>           edit-1 neighbors in reference emission order
    FREQ <token> [...]     document frequency of token(s)
    AUTOCOMPLETE [on|off]  toggle last-token prefix expansion
    FILTERS [json|off]     set session filters, e.g. {"role": ["user"]}
    K <n>                  result count per query
    DBINFO                 index stats (≙ shell DBINFO)
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

    # -- commands -----------------------------------------------------------
    def do_search(self, q: str, explain: bool = False) -> str:
        from .query.engine import FILTER_GID_BASE, Query

        self.qid += 1
        qid = f"sh{self.qid}"
        t0 = time.time()
        res = self.engine.search(
            [Query(qid=qid, q=q, k=self.k,
                   autocomplete=self.autocomplete, filters=self.filters)]
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
            f"tokens: {analyze_str(q, self.cfg.synonyms)}"
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
        if cmd == "TOKENIZE":
            return self.do_tokenize(rest)
        if cmd == "FUZZY":
            return self.do_fuzzy(rest)
        if cmd == "FREQ":
            return self.do_freq(rest)
        if cmd == "DBINFO":
            return self.do_dbinfo()
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
