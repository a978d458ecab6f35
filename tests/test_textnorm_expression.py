"""clean_document_text expression (r7 replace/translate/btrim form) must be
an exact twin of the pre-r7 regexp_replace chain and of the Python kernel.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from information_extraction_t5_spark.core import textnorm
from information_extraction_t5_spark.functions.text import (
    clean_document_text,
)

CASES = [
    "",
    "plain line",
    "  leading and trailing  ",
    "\t tabs\tinside \t",
    "a\n\n\nb",
    " \n x \n\n y \t\n z \n ",
    "´accent´ and ™mark™ and …dots…",
    "´´ doubled ´´",
    "™™",
    "……",
    "༡༨/༢ stripped ༡༨/༢",
    "\r\rcarriage\r\n returns\r",
    "\x0b vertical \x0b\x0b tab \x0c\x0c feed",
    "mixed \t\n ´…™ ༡༨/༢ \n\t everything \r\n",
    "\n",
    " \t\r\n\x0b\x0c",
    "no-ws-at-all",
    "….\n…´\t™",
]


def _old_chain(col):
    c = F.regexp_replace(col, "༡༨/༢", "")
    c = F.regexp_replace(c, r"\t", " ")
    c = F.regexp_replace(c, r"\s*\n+\s*", "\n")
    c = F.regexp_replace(c, r"(\s)\1+", "$1")
    c = F.regexp_replace(c, "´", "'")
    c = F.regexp_replace(c, "™", "TM")
    c = F.regexp_replace(c, "…", "...")
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def test_clean_document_text_expression_twin(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)],
                               "i int, s string")
    rows = (
        df.select("i", "s",
                  clean_document_text(F.col("s")).alias("new"),
                  _old_chain(F.col("s")).alias("old"))
        .collect()
    )
    for r in rows:
        assert r["new"] == r["old"], f"input={r['s']!r}"
        assert r["new"] == textnorm.clean_document_text(r["s"]), \
            f"kernel mismatch input={r['s']!r}"
