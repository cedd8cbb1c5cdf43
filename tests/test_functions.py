"""Unit tests for the shared pure-python semantics (no Spark needed)."""
from __future__ import annotations

from document_ai_spark import constants as C
from document_ai_spark.functions import extraction as X
from document_ai_spark.functions import layout as L
from document_ai_spark.functions.fuzzy import partial_ratio, ratio
from document_ai_spark.functions.textops import extract_main_text


def test_ratio_basics():
    assert ratio("abc", "abc") == 100
    assert ratio("", "") == 100
    assert 0 < ratio("abcd", "abce") < 100


def test_partial_ratio_substring_is_100():
    assert partial_ratio("SWARAJ 744 FE", "MODEL: SWARAJ 744 FE TRACTOR") == 100
    assert partial_ratio("xyz", "no overlap at all") < 40


def test_extract_hp_patterns_and_range():
    assert X.extract_hp("Power: 45 HP") == 45
    assert X.extract_hp("Power: 45 एचपी") == 45
    assert X.extract_hp("HP: 55") == 55
    assert X.extract_hp("Power: 350 HP") is None   # out of range
    assert X.extract_hp("no power here") is None


def test_extract_cost_takes_max():
    t = "Advance: Rs. 1,00,000\nGrand Total: Rs. 9,11,769"
    assert X.extract_cost(t) == 911769.0
    assert X.extract_cost("Rs. 5,000") is None     # below candidate floor


def test_extract_dealer_header_prior():
    lines = ["Sri Amutham Tractors"] + ["filler"] * 12
    assert X.extract_dealer("\n".join(lines)) == "Sri Amutham Tractors"
    # Dealer on line 11 is invisible (first-10-lines prior).
    lines = ["filler"] * 10 + ["Sri Amutham Tractors"]
    assert X.extract_dealer("\n".join(lines)) is None


def test_extract_fields_fuzzy_beats_pattern():
    text = "Mahindra & Mahindra Ltd\nModel: SWARAJ 744 FE\n45 HP\nTotal: Rs. 6,50,000"
    r = X.extract_fields(text)
    # '&' breaks the case-sensitive dealer regex; fuzzy substring match wins.
    assert r["dealer_name"]["value"] == "Mahindra & Mahindra Ltd"
    assert r["dealer_name"]["method"] == "fuzzy"
    assert r["dealer_name"]["confidence"] == 1.0
    assert r["horse_power"]["value"] == 45
    assert r["asset_cost"]["value"] == 650000.0


def test_post_process_nulls_out_of_range_cost():
    text = "Total: Rs. 50,000"   # >10k candidate but <1e5 validity floor
    r = X.extract_fields(text)
    assert r["asset_cost"]["value"] is None
    assert r["asset_cost"]["confidence"] == 0.0


def test_kv_fill_only_when_missing_or_low_conf():
    r = X.extract_fields("nothing useful", kv_fields={"horse_power": "60"})
    assert r["horse_power"]["value"] == 60
    assert r["horse_power"]["method"] == "kv"
    # Pattern HP (conf .9) must NOT be overridden by kv.
    r2 = X.extract_fields("55 HP", kv_fields={"horse_power": "60"})
    assert r2["horse_power"]["value"] == 55
    assert r2["horse_power"]["method"] == "pattern"


def test_boilerplate_strip_removes_nav_footer():
    html = ("<html><body><nav><a href='/a'>A</a> <a href='/b'>B</a></nav>"
            "<div>Sri Amutham Tractors</div><p>real content words here</p>"
            "<footer><a href='#'>Privacy</a></footer></body></html>")
    main = extract_main_text(html)
    assert "Sri Amutham Tractors" in main
    assert "real content words here" in main
    assert "Privacy" not in main
    assert "A" not in main.split()


def test_plain_text_passthrough_keeps_lines():
    txt = "line one\nline two"
    assert extract_main_text(txt) == txt


def test_signature_heuristic_region_and_aspect():
    page_w, page_h = 1000, 1000
    marks = [
        # valid: bottom 40%, aspect 3, area 1.5% of region
        {"cls": "signature", "x1": 100, "y1": 700, "x2": 400, "y2": 800},
        # rejected: top of page
        {"cls": "signature", "x1": 100, "y1": 50, "x2": 400, "y2": 150},
        # rejected: aspect 1.0
        {"cls": "signature", "x1": 100, "y1": 650, "x2": 200, "y2": 750},
    ]
    dets = L.detect_signatures(marks, page_w, page_h)
    assert len(dets) == 1
    assert dets[0]["box"] == (100, 700, 400, 800)


def test_stamp_heuristic_and_merge():
    page_w, page_h = 1000, 1000
    marks = [
        {"cls": "stamp", "x1": 100, "y1": 100, "x2": 250, "y2": 250},
        # overlapping near-duplicate -> merged into the first
        {"cls": "stamp", "x1": 110, "y1": 110, "x2": 260, "y2": 260},
        # rejected: extreme aspect, tiny height
        {"cls": "stamp", "x1": 10, "y1": 10, "x2": 500, "y2": 28},
    ]
    dets = L.detect_stamps(marks, page_w, page_h)
    assert len(dets) == 1
    assert dets[0]["box"] == (100, 100, 260, 260)


def test_iou():
    assert L.iou((0, 0, 10, 10), (0, 0, 10, 10)) == 1.0
    assert L.iou((0, 0, 10, 10), (20, 20, 30, 30)) == 0.0


def test_zone_classify():
    assert L.zone_of(0, 100, 1000) == "header"
    assert L.zone_of(450, 550, 1000) == "body"
    assert L.zone_of(900, 990, 1000) == "footer"


def test_conf_bucket():
    assert X.conf_bucket(0.95) == "very_high"
    assert X.conf_bucket(0.85) == "high"
    assert X.conf_bucket(0.7) == "medium"
    assert X.conf_bucket(0.5) == "low"
    assert X.conf_bucket(0.1) == "very_low"


def test_validate_against_master():
    v = X.validate_against_master("MAHINDRA & MAHINDRA LTD", "swaraj 744 fe")
    assert v["dealer_name"]["valid"] is True
    assert v["dealer_name"]["matched_to"] == "Mahindra & Mahindra Ltd"
    assert v["model_name"]["valid"] is True
    v2 = X.validate_against_master("Totally Unknown Corp", None)
    assert v2["dealer_name"]["valid"] is False
    assert v2["model_name"]["valid"] is False
