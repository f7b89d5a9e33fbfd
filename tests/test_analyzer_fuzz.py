"""Randomized (seed-stable) cross-engine analyzer fuzz: beyond the curated
goldens, 400 random unicode strings drawn from adversarial alphabets must
tokenize identically in pure Python, the Spark Column expression, and the
DuckDB SQL emitter. This is the per-row invariant surface under fire."""
from __future__ import annotations

import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from planet_search_spark import analysis as A

ALPHABETS = [
    "abcdefghij XYZ  0123456789",
    "אבגדהוזחטיךכלםמןנסעףפץצקרשתְֱִַֻׁׂ",
    "éèêëàâäüöòñçÉÈÊÀÄÜÖÑÇßæœÆŒØøŁłĐđ",
    "'‘’ʼ-_.,!?;:()[]{}#@$%&*+=/\\|\"",
    "абвгдежзиклмнопрстуфхАБВГДЕЖЗ",
    "ابتثجحخدذرزسشصضطظعغفقكلمنهوي",
    "ωμέγαλφβήτΩΜΈΓΛΦΒΉΤ",
    "\t\n   ​",
    "混合中文字符テストですへんか",
]


def _random_texts(n: int, seed: int = 99) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randrange(0, 30)):
            alpha = ALPHABETS[rng.randrange(len(ALPHABETS))]
            parts.append(alpha[rng.randrange(len(alpha))])
        out.append("".join(parts))
    return out


def test_fuzz_three_way_equivalence(spark):
    texts = _random_texts(400)
    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    got = sdf.select("text", A.tokens_col(F.col("text")).alias("tok"),
                     A.keyword_col(F.col("text")).alias("kw")).collect()
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"text": texts}))
    duck = con.sql(f"SELECT text, {A.sql_tokens_expr('text')} AS tok, "
                   f"{A.sql_keyword_expr('text')} AS kw FROM t").df()
    duck_map = {r.text: (list(r.tok), r.kw) for r in duck.itertuples()}
    for row in got:
        py = A.py_tokens(row.text)
        assert list(row.tok) == py, repr(row.text)
        assert row.kw == A.py_keyword(row.text), repr(row.text)
        dtok, dkw = duck_map[row.text]
        assert dtok == py, repr(row.text)
        assert dkw == A.py_keyword(row.text), repr(row.text)
