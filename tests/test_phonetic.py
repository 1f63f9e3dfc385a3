"""Vectorized NARA Soundex (functions/phonetic.py)."""

import numpy as np

from opentapioca_ray.functions.phonetic import soundex

# canonical NARA vectors, including the H/W-transparency cases
CANONICAL = {
    "ROBERT": "R163",
    "RUPERT": "R163",
    "ASHCRAFT": "A261",  # H transparent: S-H-C merges to one '2'
    "ASHCROFT": "A261",
    "TYMCZAK": "T522",  # vowel breaks the C/Z run
    "PFISTER": "P236",  # first-letter run consumes the F
    "HONEYMAN": "H555",
    "JACKSON": "J250",
    "GUTIERREZ": "G362",
    "WASHINGTON": "W252",
    "LEE": "L000",
    "A": "A000",
    "WU": "W000",
}


def test_canonical_vectors():
    got = soundex(np.array(list(CANONICAL), dtype=object))
    assert dict(zip(CANONICAL, got)) == CANONICAL


def test_case_insensitive_tail_prefix_case_kept():
    got = soundex(np.array(["robert", "Robert", "rOBERT"], dtype=object))
    assert list(got) == ["R163", "R163", "R163"]


def test_batch_boundaries_do_not_leak():
    """Adjacent words in the flat buffer must not merge runs across the
    word boundary (e.g. ...T followed by T... stays two codes)."""
    got = soundex(np.array(["CAT", "TACK", "BOB", "BB"], dtype=object))
    # BB -> B000: the second B is absorbed by the first letter's run
    assert list(got) == ["C300", "T200", "B100", "B000"]


def test_single_chars_and_hw_heads():
    got = soundex(np.array(["H", "W", "HW", "WH", "HAH"], dtype=object))
    assert list(got) == ["H000", "W000", "H000", "W000", "H000"]


def test_matches_duckdb_expression():
    """Pin numpy soundex == the oracle's SQL formulation over a mixed
    fuzz vocabulary (pure-alpha words, the query's input contract)."""
    import duckdb

    rng = np.random.default_rng(11)
    letters = np.array(list("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"))
    words = [
        "".join(rng.choice(letters, size=rng.integers(1, 12)))
        for _ in range(500)
    ]
    got = soundex(np.array(words, dtype=object))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE w AS SELECT * FROM (VALUES "
        + ",".join(f"('{w}')" for w in words)
        + ") t(word)"
    )
    sql = con.execute(
        """
        WITH s AS (
          SELECT word, regexp_split_to_array(
            translate(upper(word), 'AEIOUYBFPVCGJKQSXZDTLMNR',
                      '000000111122222222334556'), '') AS cl
          FROM w
        ),
        k AS (SELECT word,
                list_filter(cl, (x, i) -> i = 1 OR (x != 'H' AND x != 'W'))
                  AS kept FROM s),
        c AS (SELECT word,
                list_filter(kept, (x, i) -> i = 1 OR x != kept[i - 1]) AS coll
              FROM k)
        SELECT substr(upper(word), 1, 1) || rpad(coalesce(array_to_string(
                 list_filter(coll[2:], x -> x != '0')[:3], ''), ''), 3, '0')
        FROM c
        """
    ).fetchall()
    assert [r[0] for r in sql] == list(got)
