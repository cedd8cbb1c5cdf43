"""Engine-wide constants: thresholds, master dimensions, regex surface.

Single source of truth mirroring the reference's scattered config
(reference: backend/config.py:27-68, backend/services/field_extractor.py:24-86,
backend/services/vision_service.py thresholds, backend/services/ocr_service.py
zone cutoffs). Everything the oracle and the Spark pipeline compare on is
defined exactly once here.
"""
from __future__ import annotations

# ---------------------------------------------------------------------------
# Field extraction regex patterns (reference field_extractor.py:24-54).
# Stored as Python-`re` source; the Spark side prefixes (?i) where the
# reference passed re.IGNORECASE (HP/cost/model — dealer is case-sensitive,
# field_extractor.py:219).
# ---------------------------------------------------------------------------
HP_PATTERNS = [
    r"(\d{2,3})\s*[Hh][Pp]",
    r"(\d{2,3})\s*H\.?P\.?",
    r"HP\s*[-:]?\s*(\d{2,3})",
    r"Horse\s*Power\s*[-:]?\s*(\d{2,3})",
    r"(\d{2,3})\s*एचपी",          # Hindi "HP"
    r"(\d{2,3})\s*अश्वशक्ति",      # Hindi "horsepower"
]

COST_PATTERNS = [
    r"(?:Rs\.?|₹|INR)\s*([\d,]+(?:\.\d{2})?)",
    r"Total\s*[-:]?\s*(?:Rs\.?|₹)?\s*([\d,]+(?:\.\d{2})?)",
    r"Grand\s*Total\s*[-:]?\s*(?:Rs\.?|₹)?\s*([\d,]+(?:\.\d{2})?)",
    r"Amount\s*[-:]?\s*(?:Rs\.?|₹)?\s*([\d,]+(?:\.\d{2})?)",
    r"Full\s*Cost.*?(?:Rs\.?|₹)?\s*([\d,]+(?:\.\d{2})?)",
    r"([\d,]+(?:\.\d{2})?)\s*(?:only|Only)",
    r"Cost\s*of\s*Tractor\s*[-:]?\s*(?:Rs\.?|₹)?\s*([\d,]+(?:\.\d{2})?)",
]

# (pattern, n_groups) — reference joins all groups with " " when >1
# (field_extractor.py:208).
MODEL_PATTERNS = [
    (r"Model\s*[-:]?\s*([A-Za-z0-9\s\-+]+(?:\d+[A-Za-z]*|\s*[IVX]+)?)", 1),
    (r"Tractor\s+([A-Z]{2,}\s*[-]?\s*\d{2,4}[A-Za-z\s\-+]*)", 1),
    (r"([A-Z]{2,}\s*[-]?\s*\d{3,4}\s*[A-Za-z\-+]*)", 1),
    (r"(SWARAJ|SONALIKA|MAHINDRA|JOHN DEERE|NEW HOLLAND|KUBOTA|MF|MASSEY|TAFE)[\s\-]*([A-Za-z0-9\s\-+]+)", 2),
]

DEALER_PATTERNS = [
    r"^([A-Z][A-Za-z\s\.]+(?:Ltd\.?|Limited|Corporation|Tractors|Sales|Dealers?))",
    r"Dealer\s*[-:]?\s*([A-Za-z\s\.]+)",
    r"([A-Z][A-Za-z\s\.]+Tractors)",
    r"([A-Z][A-Za-z\s\.]+(?:Agro|Agriculture|Industries)[\s]+[A-Za-z\.]+)",
]

# ---------------------------------------------------------------------------
# Master dimensions (reference field_extractor.py:57-86). Index order is the
# deterministic tie-break: the reference keeps the FIRST list entry on score
# ties (`score > best` at field_extractor.py:246).
# ---------------------------------------------------------------------------
DEALER_MASTER = [
    "The Odisha Agro Industries Corporation Ltd",
    "International Tractors Ltd",
    "Sri Amutham Tractors",
    "Mahindra & Mahindra Ltd",
    "TAFE Motors and Tractors Ltd",
    "National Tractor Sales",
    "Kubota Tractor Corporation",
    "John Deere India",
    "New Holland Agriculture",
    "Escorts Kubota Ltd",
    "Sonalika International Tractors Ltd",
    "नेशनल ट्रैक्टर सेल्स",
]

MODEL_MASTER = [
    "DI-745 III HDM+4WD",
    "SWARAJ 744 FE",
    "SONALIKA TIGER 55-4WD",
    "MF 241 DI",
    "MF 1035 DI",
    "MF 7250 DI",
    "MF 9000 DI",
    "TAFE 9500",
    "Kubota MU 5502 4WD",
    "Mahindra 475 DI",
    "John Deere 5050D",
    "New Holland 3630",
]

# ---------------------------------------------------------------------------
# Validation / confidence thresholds.
# ---------------------------------------------------------------------------
HP_MIN, HP_MAX = 20, 200                  # field_extractor.py:179,398-402
COST_MIN_CANDIDATE = 10_000               # field_extractor.py:194
COST_MIN, COST_MAX = 100_000, 50_000_000  # field_extractor.py:407
MODEL_MIN_LEN = 3                         # field_extractor.py:210 (len > 3)
DEALER_MIN_LEN = 5                        # field_extractor.py:222 (len > 5)

CONF_HP_PATTERN = 0.9          # field_extractor.py:181
CONF_COST_PATTERN = 0.85       # field_extractor.py:202
CONF_MODEL_PATTERN = 0.75      # field_extractor.py:212
CONF_DEALER_PATTERN = 0.7      # field_extractor.py:224

FUZZY_DEALER_EXTRACT_MIN = 70  # field_extractor.py:246
FUZZY_MODEL_EXTRACT_MIN = 75   # field_extractor.py:260
FUZZY_DEALER_VALID_MIN = 90    # field_extractor.py:435
FUZZY_MODEL_VALID_MIN = 85     # field_extractor.py:448

DEALER_HEADER_LINES = 10       # field_extractor.py:217

# Zone classification cutoffs (ocr_service.py:155-161).
ZONE_HEADER_MAX = 0.2
ZONE_FOOTER_MIN = 0.8

# Vision heuristics (vision_service.py:123-272).
SIG_REGION_TOP = 0.6           # bottom 40% of page
SIG_AREA_MIN_FRAC = 0.005
SIG_AREA_MAX_FRAC = 0.15
SIG_ASPECT_MIN, SIG_ASPECT_MAX = 1.5, 6.0
SIG_CONF = 0.65
SIG_TOPK = 3
STAMP_AREA_MIN_FRAC = 0.005
STAMP_AREA_MAX_FRAC = 0.10
STAMP_CIRC_MIN = 0.4
STAMP_ASPECT_MIN, STAMP_ASPECT_MAX = 0.7, 1.4
STAMP_BASE_CONF = 0.6
STAMP_CIRC_WEIGHT = 0.3
STAMP_TOPK = 5
MERGE_IOU_THRESHOLD = 0.3      # vision_service.py:274
MATCH_IOU_THRESHOLD = 0.5      # document_processor.py:533-545

PAGE_BREAK = "\n\n--- PAGE BREAK ---\n\n"   # document_processor.py:141

# Confidence-level buckets (agentic_ai.py:391-402).
CONF_BUCKETS = [
    (0.9, "very_high"),
    (0.8, "high"),
    (0.6, "medium"),
    (0.4, "low"),
]
CONF_BUCKET_DEFAULT = "very_low"

# Boilerplate stripping (north_star DOM heuristics — ours, not reference's:
# the reference never sees HTML; thresholds chosen once, shared by oracle
# and pipeline).
BP_LINK_RATIO_MAX = 0.5      # block is chrome if link-text / text > 0.5
BP_TAG_DENSITY_MAX = 0.34    # block is chrome if tags per word > 0.34
BP_MIN_TEXT_LEN = 1          # drop empty blocks
BP_CHROME_TAGS = {"nav", "footer", "header", "aside", "script", "style"}
BP_BLOCK_TAGS = {
    "div", "p", "li", "ul", "ol", "table", "tr", "td", "th", "h1", "h2",
    "h3", "h4", "h5", "h6", "nav", "footer", "header", "aside", "section",
    "article", "br", "body", "html", "title", "script", "style",
}

# Text-quality scoring defaults (operators/textquality.py).
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "be", "this", "that", "from",
]

# Media-stage salting FLOOR / fallback: the default extraction path now
# derives K from span-count quantiles at plan build
# (plans.pipeline.derive_salt_buckets, SURVEY §7.4 hard-part 3); this
# constant is the minimum K and the value used when the corpus is empty
# or a caller pins salting explicitly.
MEDIA_SALT_BUCKETS = 8
