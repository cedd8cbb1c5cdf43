"""diversity_stats semantics: TTR / token entropy / char entropy must
separate the failure modes each one exists to catch, with exact values
on hand-computable inputs. Cross-engine parity of the registry row is
covered by test_entry_oracle.py like every other oracle entry."""
from __future__ import annotations

import math

from pyspark.sql import Row

from document_ai_spark.operators.textquality import with_diversity_stats


def _run(spark, texts):
    df = spark.createDataFrame(
        [Row(doc_id=f"d{i}", text=t) for i, t in enumerate(texts)])
    rows = with_diversity_stats(df).orderBy("doc_id").collect()
    return {r["doc_id"]: r for r in rows}


def test_exact_values(spark):
    out = _run(spark, [
        "x y z x y z x y z",      # 3 types x 3 -> H = log2(3)
        "spam spam spam spam",    # 1 type      -> H = 0, +0.0 not -0.0
        "a b c d",                # uniform     -> H = 2 bits
    ])
    d0 = out["d0"]
    assert d0["n_types"] == 3
    assert d0["ttr"] == round(3 / 9, 6)
    assert d0["token_entropy"] == round(math.log2(3), 6)
    # chars: x,y,z equal multiplicity -> same entropy as tokens
    assert d0["char_entropy"] == round(math.log2(3), 6)

    d1 = out["d1"]
    assert d1["token_entropy"] == 0.0
    assert math.copysign(1.0, d1["token_entropy"]) == 1.0  # +0.0, not -0.0
    assert d1["ttr"] == 0.25
    # chars s,p,a,m uniform -> 2 bits
    assert d1["char_entropy"] == 2.0

    assert out["d2"]["token_entropy"] == 2.0
    assert out["d2"]["ttr"] == 1.0


def test_signal_separation(spark):
    natural = ("the quick brown fox jumps over the lazy dog while the "
               "cat watches from the warm windowsill")
    blob = "QmFzZTY0IGJsb2JzIGxvb2sgbGlrZSB0aGlzIGZvcmV2ZXIx+/=="
    spam = "buy buy buy buy buy buy buy buy buy buy buy buy"
    runs = "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"
    out = _run(spark, [natural, blob, spam, runs])

    # A base64 blob is ONE token (token gates see nothing wrong) but its
    # character entropy is far above natural prose's repetitive letters.
    assert out["d1"]["n_types"] == 1
    assert out["d1"]["token_entropy"] == 0.0
    assert out["d1"]["char_entropy"] > 4.0

    # Word spam: token entropy 0 and low char entropy; natural text high
    # token entropy. Single-char runs pin BOTH to zero.
    assert out["d2"]["token_entropy"] == 0.0
    assert out["d0"]["token_entropy"] > 3.0
    assert out["d3"]["token_entropy"] == 0.0
    assert out["d3"]["char_entropy"] == 0.0
    assert out["d0"]["char_entropy"] > out["d2"]["char_entropy"]


def test_degenerate_inputs(spark):
    out = _run(spark, ["", "   \t\n", "　　", "a"])
    for k in ("d0", "d1", "d2"):
        assert out[k]["n_types"] == 0
        assert out[k]["ttr"] == 0.0
        assert out[k]["token_entropy"] == 0.0
        assert out[k]["char_entropy"] == 0.0
    assert out["d3"]["n_types"] == 1
    assert out["d3"]["ttr"] == 1.0
    assert out["d3"]["char_entropy"] == 0.0


def test_cjk_tokens_feed_entropy(spark):
    # Script-aware tokenizer: CJK chars are tokens, so a no-space CJK
    # doc has real token entropy instead of collapsing to one token.
    out = _run(spark, ["你好世界你好世界再见"])
    d = out["d0"]
    # 你(2) 好(2) 世(2) 界(2) 再(1) 见(1): 6 types over 10 tokens
    assert d["n_types"] == 6
    assert d["ttr"] == 0.6
    h = -(4 * (0.2 * math.log2(0.2)) + 2 * (0.1 * math.log2(0.1)))
    assert d["token_entropy"] == round(h, 6)
