"""Deterministic synthetic transcripts corpus + reference query set.

Shape per BASELINE.json ``input_hint``: an (Iceberg-style) table of
multi-turn conversation / agent transcripts with columns
``(conv_id:string, turn_idx:int, role:string, text:string,
tool:string, ts:timestamp)`` plus a derived deterministic
``importance`` in [0,1] (tie-break analog of
``/root/reference/addok/helpers/results.py:51-57``).

Generation is *distributed and partition-invariant*: each
conversation's content is a pure function of ``(seed, conv_index)``
(numpy PCG64 seeded per conversation), produced by ``mapInPandas``
over ``spark.range`` — so the same corpus materializes identically at
any parallelism level, which is what the N-vs-4N scaling benchmark
requires.

Vocabulary: ~10k-word Zipf-distributed lexicon with accented /
mixed-case forms (exercises fold, reference text.py:105-109), digit
tokens (kind-flagging, text.py:236-244), and a long tail of rare
tokens vs a heavy common head (COMMON_THRESHOLD analog,
default.py:30).
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("importance", T.DoubleType(), False),
    ]
)

ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(["bash", "grep", "browser", "editor", "search", "python"])
EPOCH = dt.datetime(2026, 1, 1)

_ACCENTED = [
    "Andrésy", "Étretat", "Vitry", "Erispœ", "Fontainebleau", "Sèvres",
    "Orléans", "Besançon", "Nîmes", "Ångström", "Zürich", "Graçay",
]


def build_vocab(size: int = 10_000) -> np.ndarray:
    """Deterministic lexicon: common head, accented forms, digits,
    and a synthetic long tail (w0001..)."""
    head = (
        "the a of to and in is for on with run file error test data query "
        "result output user tool model token index search build spark table "
        "read write list code line function call open close start stop"
    ).split()
    rng = np.random.Generator(np.random.PCG64(1234))
    tail = [f"w{i:05d}" for i in range(size - len(head) - len(_ACCENTED) - 50)]
    digits = [str(int(x)) for x in rng.integers(1, 99999, size=50)]
    vocab = np.array(head + _ACCENTED + digits + tail, dtype=object)
    return vocab


def _gen_conversations(conv_indexes: np.ndarray, seed: int, vocab: np.ndarray) -> pd.DataFrame:
    """Generate all turns for the given conversation indexes."""
    zipf_a = 1.3
    rows_conv, rows_turn, rows_role, rows_text, rows_tool, rows_ts, rows_imp = (
        [], [], [], [], [], [], [],
    )
    vsize = len(vocab)
    for ci in conv_indexes:
        rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + int(ci)))
        n_turns = int(rng.integers(16, 65))
        conv_id = f"conv-{int(ci):08d}"
        importance = float((int(ci) * 2654435761 % 1_000_003) / 1_000_003.0)
        base_ts = EPOCH + dt.timedelta(seconds=int(ci) * 97)
        lens = rng.integers(3, 61, size=n_turns)
        roles = ROLES[rng.integers(0, 3, size=n_turns)]
        tool_mask = roles == "tool"
        tools = np.where(
            tool_mask, TOOLS[rng.integers(0, len(TOOLS), size=n_turns)], None
        )
        for t in range(n_turns):
            # Zipf ranks clipped into vocab → heavy head / long tail
            ranks = np.minimum(rng.zipf(zipf_a, size=int(lens[t])) - 1, vsize - 1)
            words = vocab[ranks]
            rows_conv.append(conv_id)
            rows_turn.append(t)
            rows_role.append(roles[t])
            rows_text.append(" ".join(words))
            rows_tool.append(tools[t])
            rows_ts.append(base_ts + dt.timedelta(seconds=t))
            rows_imp.append(importance)
    return pd.DataFrame(
        {
            "conv_id": rows_conv,
            "turn_idx": np.array(rows_turn, dtype=np.int32),
            "role": rows_role,
            "text": rows_text,
            "tool": rows_tool,
            "ts": rows_ts,
            "importance": rows_imp,
        }
    )


def transcripts_df(
    spark: SparkSession,
    n_conversations: int = 100,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic transcripts table (~40 turns/conv)."""
    vocab = build_vocab()
    parts = partitions or max(2, min(64, n_conversations // 8 or 1))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_conversations(pdf["id"].to_numpy(), seed, vocab)

    return (
        spark.range(0, n_conversations, 1, parts)
        .mapInPandas(gen, schema=SCHEMA)
    )


def transcripts_pdf(n_conversations: int = 100, seed: int = 42) -> pd.DataFrame:
    """Same corpus, single-process pandas (oracle / unit tests)."""
    vocab = build_vocab()
    return _gen_conversations(np.arange(n_conversations), seed, vocab)


# ---------------------------------------------------------------------------
# reference query set (FIXTURES.md §2; mirrors tests/test_search.py scenarios)
# ---------------------------------------------------------------------------

def reference_queries(corpus: pd.DataFrame, n: int = 60, seed: int = 7) -> pd.DataFrame:
    """Derive a deterministic query set from the corpus: exact
    multi-token phrases, accent/case variants, one-typo tokens,
    prefix-truncated last tokens (autocomplete), all-common-token
    queries, and queries with a not-found token."""
    rng = np.random.Generator(np.random.PCG64(seed))
    texts = corpus["text"].to_numpy()
    qids, qs, kinds = [], [], []

    def add(q: str, kind: str) -> None:
        qids.append(f"q-{len(qids):04d}")
        qs.append(q)
        kinds.append(kind)

    picks = rng.integers(0, len(texts), size=n)
    for i, pi in enumerate(picks):
        words = str(texts[pi]).split()
        if len(words) < 3:
            words = (words * 3)[:3]
        lo = int(rng.integers(0, max(1, len(words) - 3)))
        phrase = words[lo : lo + 3]
        mode = i % 6
        if mode == 0:
            add(" ".join(phrase), "exact")
        elif mode == 1:
            add(" ".join(w.upper() for w in phrase), "case")
        elif mode == 2:  # one-typo: swap two adjacent chars of longest word
            w = max(phrase, key=len)
            if len(w) >= 4:
                j = int(rng.integers(0, len(w) - 1))
                w2 = w[:j] + w[j + 1] + w[j] + w[j + 2 :]
                add(" ".join(w2 if x == w else x for x in phrase), "typo")
            else:
                add(" ".join(phrase), "exact")
        elif mode == 3:  # autocomplete prefix on last token
            w = phrase[-1]
            add(" ".join(phrase[:-1] + [w[: max(3, len(w) - 2)]]), "prefix")
        elif mode == 4:
            add("the of to and", "common")
        else:
            add(" ".join(phrase[:2] + ["zzzqqqxxx"]), "notfound")
    return pd.DataFrame({"qid": qids, "q": qs, "kind": kinds, "k": 10})
