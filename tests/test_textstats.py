"""PII detection/redaction (pipelines/textstats.py): class counts on
the original text, sequential replacement in PII_PATTERNS order, and
clean-text passthrough."""

from addok_spark.pipelines.textstats import pii_redact


def test_pii_redact_counts_and_replacement(spark):
    rows = [
        (1, "mail me at jo.doe+x@example.co.uk today"),
        (2, "server 192.168.1.10 and 10.0.0.1 up"),
        (3, "ssn 123-45-6789 on file"),
        (4, "call +33 612-345-678 or +1 555-0042"),
        (5, "nothing sensitive here"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in pii_redact(df, "id", "text").collect()}
    assert out[1]["n_email"] == 1 and out[1]["redacted"] == (
        "mail me at <EMAIL> today"
    )
    assert out[2]["n_ipv4"] == 2 and out[2]["redacted"] == (
        "server <IP> and <IP> up"
    )
    assert out[3]["n_ssn"] == 1 and "<SSN>" in out[3]["redacted"]
    assert out[4]["n_phone"] == 2 and out[4]["redacted"] == (
        "call <PHONE> or <PHONE>"
    )
    assert out[5]["n_pii"] == 0 and out[5]["redacted"] == rows[4][1]
    assert out[6]["n_pii"] == 0 and out[6]["redacted"] == ""
    for i, r in out.items():
        assert r["n_pii"] == (
            r["n_email"] + r["n_ipv4"] + r["n_ssn"] + r["n_phone"]
        )


def test_unigram_logprob(spark):
    from addok_spark.pipelines.textstats import unigram_logprob

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the the the the the the"),   # all head-token: most probable
        (3, "zyxq qwvz plfk"),            # hapax salad: least probable
        (4, ""),                          # no tokens: dropped
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in
           unigram_logprob(df, "id", "text").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_tokens"] == 6 and out[2]["n_tokens"] == 6
    # repetitive boilerplate scores above average; hapax salad below
    assert out[2]["avg_logprob"] > out[1]["avg_logprob"] > out[3]["avg_logprob"]
    # ppl is 2^-avg_logprob of the rounded avg
    import math
    for r in out.values():
        assert abs(r["ppl"] - round(2 ** -r["avg_logprob"], 4)) < 1e-9
        assert r["avg_logprob"] < 0
    # "the" appears 8/15 times: its logp = log2(8/15); doc 2 avg == that
    assert out[2]["avg_logprob"] == round(math.log2(8 / 15), 6)


def test_highlight_snippets(spark):
    from addok_spark.pipelines.textstats import highlight_snippets

    rows = [
        # hit at position 1: window clamps to the text start
        (1, "merge the tables then sort and scan them all quickly now"),
        # earliest of two terms wins (vector@3 < merge@6); punctuation
        # folds away before matching
        (2, "we need a Vector, then MERGE: yes merge"),
        # no hit -> filtered out
        (3, "nothing relevant here"),
        # hit deep inside: centered +-2 window
        (4, "a b c d e merge f g h i j"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r
        for r in highlight_snippets(
            df, "id", "text", ["merge", "vector"], window=2
        ).collect()
    }
    assert set(out) == {1, 2, 4}
    assert out[1]["first_pos"] == 1 and out[1]["n_hits"] == 1
    assert out[1]["snippet"] == "merge the tables then sort"
    assert out[1]["highlighted"] == "<em>merge</em> the tables then sort"
    assert out[2]["first_pos"] == 4 and out[2]["n_hits"] == 3
    assert out[2]["snippet"] == "need a vector then merge"
    assert out[2]["highlighted"] == (
        "need a <em>vector</em> then <em>merge</em>"
    )
    assert out[4]["first_pos"] == 6
    assert out[4]["snippet"] == "d e merge f g"
    assert out[4]["highlighted"] == "d e <em>merge</em> f g"


def test_bigram_logprob_penalizes_shuffled_transitions(spark):
    from addok_spark.pipelines.textstats import bigram_logprob

    # corpus establishes 'the cat sat' transitions; doc 3 uses the
    # same unigrams in an unseen order → lower bigram logprob
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the rug"),
        (3, "mat the on sat cat the"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in bigram_logprob(df, "id", "text").collect()}
    assert set(out) == {1, 2, 3}          # empty doc dropped
    assert out[1]["n_tokens"] == 6
    assert out[1]["avg_logprob"] > out[3]["avg_logprob"]
    assert out[3]["ppl"] > out[1]["ppl"]
