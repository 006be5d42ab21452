"""Phonetic blocking keys (American Soundex) — the classic record-linkage
blocking family (Febrl / recordlinkage standard): names that sound alike get
equal 4-char codes, so a soundex equi-join is a zero-false-dismissal blocker
for spelling-variant names (Robert/Rupert -> R163).

Implementation is a chain of regexp_replace/CASE Catalyst expressions —
zero shuffle, whole-stage codegen — chosen over Spark's builtin `soundex`
because the identical chain re-renders as portable SQL (`soundex_sql`): the
DuckDB oracle runs the same algorithm by construction (DuckDB has no
soundex, and RE2 has no backreferences, so duplicate-collapse is per-digit).
`tests/test_phonetic.py` additionally pins agreement with Spark's builtin
soundex on the alphabetic test corpus.

Algorithm (American Soundex, h/w collapse rule):
  1. keep letters only, lowercase; empty -> null
  2. first letter retained as the code's letter
  3. drop h/w (same-coded consonants separated by h/w collapse), map
     vowels->0 (separator: same codes across a vowel do NOT collapse),
     consonants->1..6
  4. collapse adjacent duplicate digits, drop the first letter's own code,
     drop separators, pad/truncate to letter + 3 digits
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

_GROUPS = [
    ("[bfpv]", "1"),
    ("[cgjkqsxz]", "2"),
    ("[dt]", "3"),
    ("[l]", "4"),
    ("[mn]", "5"),
    ("[r]", "6"),
    ("[aeiouy]", "0"),
]


def soundex_key(col: Column) -> Column:
    """4-char American Soundex code (e.g. 'R163'), null for inputs with no
    ASCII letters."""
    s = F.lower(F.regexp_replace(col, "[^A-Za-z]", ""))
    first = F.upper(F.substring(s, 1, 1))
    coded = F.regexp_replace(s, "[hw]", "")
    for pat, digit in _GROUPS:
        coded = F.regexp_replace(coded, pat, digit)
    for d in "0123456":
        coded = F.regexp_replace(coded, f"{d}{d}+", d)
    # Drop the first letter's own code: after h/w removal + collapse, a
    # coded-consonant first letter contributes exactly the leading digit.
    # Vowel-initial strings lead with '0' (stripped with the separators);
    # h/w-initial strings contributed nothing.
    body = F.when(
        first.isin(*list("AEIOUYHW")), coded
    ).otherwise(F.substring(coded, 2, 1000000))
    body = F.regexp_replace(body, "0", "")
    return F.when(
        F.length(s) > 0, F.concat(first, F.rpad(F.substring(body, 1, 3), 3, "0"))
    )


def soundex_sql(expr: str) -> str:
    """The identical algorithm as a portable SQL scalar expression over
    `expr` (DuckDB-safe: RE2 regexes, no backreferences)."""
    s = f"lower(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    coded = f"regexp_replace({s}, '[hw]', '', 'g')"
    for pat, digit in _GROUPS:
        coded = f"regexp_replace({coded}, '{pat}', '{digit}', 'g')"
    for d in "0123456":
        coded = f"regexp_replace({coded}, '{d}{d}+', '{d}', 'g')"
    first = f"upper(substr({s}, 1, 1))"
    body = (
        f"CASE WHEN {first} IN ('A','E','I','O','U','Y','H','W') THEN {coded} "
        f"ELSE substr({coded}, 2) END"
    )
    body = f"regexp_replace({body}, '0', '', 'g')"
    return (
        f"CASE WHEN length({s}) > 0 "
        f"THEN {first} || rpad(substr({body}, 1, 3), 3, '0') END"
    )
