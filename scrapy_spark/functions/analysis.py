"""Content analysis: recency/date extraction and academic-indicator
classification (content_analysis.py:18-58, 283-462, 550-621) as pure
column logic.

The reference mines dates from page text with a regex chain (ISO dates,
"Month D, YYYY", academic semesters), takes the most recent as the page's
freshness anchor, and scores indicator-keyword families (course / research /
policy / faculty) to classify academic content. Both are deterministic
regex+arithmetic — the Spark form is `regexp_extract_all` + array ops
(JVM-side, zero UDFs) and the DuckDB twins below are GENERATED from the same
pattern constants, proving the patterns live in the Java/RE2 common subset
(the same portability contract as functions/mining.py).

Exactness rules (CLAUDE.md): "now" is a pinned AS_OF date (cross-engine
determinism); confidence is integer milli (min(score/10,1)*1000); indicator
scores are kept in DOUBLED integer units so the reference's 1.5× URL boost
stays exact (2×score -> 3×score).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# pinned "today" for recency math (datetime.now() in the reference; a pinned
# constant here so both engines and repeated runs agree)
AS_OF = "2024-07-01"

# date patterns (content_analysis.py:45-58) — RE2/Java common subset
ISO_DATE = r"\b(\d{4}-\d{2}-\d{2})\b"
MONTH_NAMES = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]
MONTH_DATE = (
    r"\b(" + "|".join(MONTH_NAMES) + r")\s+(\d{1,2}),?\s+(\d{4})\b"
)
SEMESTER = r"\b(Spring|Fall|Summer|Winter)\s+(\d{4})\b"
# semester -> approximate (month, day) anchors (content_analysis.py:584-593)
SEASON_ANCHOR = {
    "Spring": (1, 15),
    "Summer": (6, 1),
    "Fall": (9, 1),
    "Winter": (12, 15),
}

# indicator families (content_analysis.py:18-42), applied to lower(text) —
# the reference lowercases then matches IGNORECASE, so the patterns here are
# pre-lowered; [s]? pluralization kept verbatim
COURSE_INDICATORS = [
    r"\bcourse[s]?\b", r"\bsyllabus\b", r"\blecture[s]?\b", r"\bsemester\b",
    r"\bcredit[s]?\b", r"\bprerequisite[s]?\b", r"\bcurriculum\b",
    r"\b[a-z]{2,4}\s*\d{3,4}\b",
    r"\bspring\s+\d{4}\b", r"\bfall\s+\d{4}\b", r"\bsummer\s+\d{4}\b",
]
RESEARCH_INDICATORS = [
    r"\bresearch\b", r"\bpublication[s]?\b", r"\bjournal\b", r"\bconference\b",
    r"\bcitation[s]?\b", r"\babstract\b", r"\bmanuscript\b", r"\bpaper[s]?\b",
    r"\bgrant[s]?\b", r"\bfunding\b", r"\blaboratory\b", r"\blab\b",
    r"\bdoi\s*:", r"\bissn\s*:", r"\bisbn\s*:",
]
POLICY_INDICATORS = [
    r"\bpolicy\b", r"\bpolicies\b", r"\bregulation[s]?\b", r"\bguideline[s]?\b",
    r"\bprocedure[s]?\b", r"\brequirement[s]?\b", r"\bstandard[s]?\b",
    r"\bcompliance\b", r"\bcode of conduct\b", r"\bhonor code\b",
]
FACULTY_INDICATORS = [
    r"\bfaculty\b", r"\bprofessor\b", r"\binstructor\b", r"\bdepartment\b",
    r"\boffice hours\b", r"\bcurriculum vitae\b",
    r"\bph\.?d\.?\b",
]
INDICATOR_FAMILIES = {
    "course": COURSE_INDICATORS,
    "research": RESEARCH_INDICATORS,
    "policy": POLICY_INDICATORS,
    "faculty": FACULTY_INDICATORS,
}
# URL boost path fragments (content_analysis.py:398-406)
URL_BOOSTS = {
    "course": ["/course", "/class"],
    "research": ["/research", "/publication"],
    "policy": ["/policy", "/regulation"],
    "faculty": ["/faculty", "/staff", "/people"],
}
# tie-break = reference dict insertion order (max() returns the first max)
FAMILY_ORDER = ["course", "research", "policy", "faculty"]


# --- Spark column expressions ---------------------------------------------


def _extract_all(text: Column, pattern: str, group: int) -> Column:
    return F.regexp_extract_all(text, F.lit(pattern), F.lit(group))


def dates_col(text: Column) -> Column:
    """array<date> of every date the reference's pattern chain finds:
    ISO yyyy-mm-dd, 'Month D, YYYY', and semester anchors — filtered to the
    reference's sane range (year 1990-2050; applied uniformly to all three
    branches, a deterministic recast of the reference's per-branch
    strptime/except checks). Calendar-invalid matches ('2024-13-45',
    'February 30, 2024') become NULL in BOTH engines (Spark non-ANSI
    to_date/make_date; DuckDB TRY_CAST in the generated twin) and NULLs are
    dropped by the range filter — tests/test_analysis.py pins this on
    adversarial fixtures."""
    # try_to_date, NOT to_date/make_date: Spark 4 defaults to ANSI mode, so
    # a calendar-invalid match ('2024-13-45', 'February 30, 2024') in real
    # page text would ABORT the whole query instead of yielding NULL
    # (caught by tests/test_analysis.py adversarial fixtures). The DuckDB
    # twin uses TRY_CAST the same way. 1-arg lambda: try_to_date's optional
    # `format` param would otherwise receive transform's element index.
    iso = F.transform(
        _extract_all(text, ISO_DATE, 1), lambda s: F.try_to_date(s)
    )
    months = F.array(*[F.lit(m) for m in MONTH_NAMES])
    md = F.transform(
        _extract_all(text, MONTH_DATE, 0),
        lambda s: F.try_to_date(
            F.concat(
                F.regexp_extract(s, r"(\d{4})", 1),
                F.lit("-"),
                F.lpad(
                    F.array_position(
                        months, F.regexp_extract(s, r"^([A-Za-z]+)", 1)
                    ).cast("string"),
                    2,
                    "0",
                ),
                F.lit("-"),
                F.lpad(F.regexp_extract(s, r"\b(\d{1,2})\b", 1), 2, "0"),
            )
        ),
    )
    sem = F.transform(
        _extract_all(text, SEMESTER, 0),
        lambda s: F.make_date(
            F.regexp_extract(s, r"(\d{4})", 1).cast("int"),
            *[_season_pick(s, idx) for idx in (0, 1)],
        ),
    )
    all_dates = F.concat(iso, md, sem)
    return F.filter(
        all_dates,
        lambda d: (F.year(d) >= 1990) & (F.year(d) <= 2050),
    )


def _season_pick(s: Column, idx: int) -> Column:
    season = F.regexp_extract(s, r"^([A-Za-z]+)", 1)
    c = F.lit(None).cast("int")
    for name, anchor in SEASON_ANCHOR.items():
        c = F.when(season == name, F.lit(anchor[idx])).otherwise(c)
    return c


def recency_cols(text: Column, as_of: str = AS_OF) -> dict[str, Column]:
    """date_count / most_recent_date / days_since_update / recent flags
    (content_analysis.py:283-366), relative to ``as_of`` ('YYYY-MM-DD').

    The default stays the PINNED AS_OF so the driver oracle is exact and
    reruns are deterministic; real-crawl callers pass today's date (the
    reference uses wall-clock ``datetime.now()``, content_analysis.py:300)."""
    dates = dates_col(text)
    most = F.array_max(dates)
    days = F.datediff(F.lit(as_of).cast("date"), most)
    return {
        "date_count": F.size(dates).alias("date_count"),
        "most_recent_date": most.cast("string").alias("most_recent_date"),
        "days_since_update": days.alias("days_since_update"),
        "has_recent_content": F.coalesce(days <= 365, F.lit(False)).alias(
            "has_recent_content"
        ),
        "has_very_recent_content": F.coalesce(days <= 30, F.lit(False)).alias(
            "has_very_recent_content"
        ),
    }


def indicator_score2_col(text_lower: Column, patterns: list[str]) -> Column:
    """DOUBLED match count over one indicator family (sum of matches per
    pattern × 2 — integer units that keep the 1.5× boost exact)."""
    s: Column = F.lit(0)
    for p in patterns:
        s = s + F.size(_extract_all(text_lower, p, 0))
    return (s * 2).cast("long")


def academic_cols(text: Column, url: Column) -> dict[str, Column]:
    """Per-family doubled scores with URL boosts, primary content_type with
    the reference's tie-break, confidence in integer milli, plus the first
    semester mention (content_analysis.py:369-462)."""
    tl, ul = F.lower(text), F.lower(url)
    out: dict[str, Column] = {}
    boosted: dict[str, Column] = {}
    for fam in FAMILY_ORDER:
        base2 = indicator_score2_col(tl, INDICATOR_FAMILIES[fam])
        hit = F.lit(False)
        for frag in URL_BOOSTS[fam]:
            hit = hit | ul.contains(frag)
        # 1.5x boost in doubled units: 2s -> 3s
        b = F.when(hit, (base2 * 3 / 2).cast("long")).otherwise(base2)
        boosted[fam] = b
        out[f"{fam}_score2"] = b.alias(f"{fam}_score2")
    best = F.greatest(*[boosted[f] for f in FAMILY_ORDER])
    ctype: Column = F.lit("general")
    for fam in reversed(FAMILY_ORDER):  # earlier families win ties
        ctype = F.when(boosted[fam] == best, F.lit(fam)).otherwise(ctype)
    # confidence < 2.0 (raw) == < 4 (doubled) -> general
    ctype = F.when(best < 4, F.lit("general")).otherwise(ctype)
    conf = F.when(best < 4, F.lit(0)).otherwise(
        F.least(best * 50, F.lit(1000))
    )
    out["content_type"] = ctype.alias("content_type")
    out["confidence_milli"] = conf.cast("long").alias("confidence_milli")
    sem = F.regexp_extract(text, SEMESTER, 0)
    out["semester"] = (
        F.when(sem != "", sem).otherwise(F.lit(None).cast("string"))
    ).alias("semester")
    return out


# --- DuckDB oracle twins (generated from the same constants) ---------------


def sql_dates(text: str) -> str:
    """DuckDB list<DATE> twin of :func:`dates_col`."""
    months = ", ".join(f"'{m}'" for m in MONTH_NAMES)
    season_whens = " ".join(
        f"WHEN '{name}' THEN {anchor[0]}" for name, anchor in SEASON_ANCHOR.items()
    )
    season_day_whens = " ".join(
        f"WHEN '{name}' THEN {anchor[1]}" for name, anchor in SEASON_ANCHOR.items()
    )
    return f"""list_filter(
      list_concat(list_concat(
        list_transform(regexp_extract_all({text}, '{ISO_DATE}', 1),
                       s -> TRY_CAST(s AS DATE)),
        list_transform(regexp_extract_all({text}, '{MONTH_DATE}', 0),
          s -> TRY_CAST(concat(
            regexp_extract(s, '(\\d{{4}})', 1), '-',
            lpad(CAST(list_position([{months}],
                      regexp_extract(s, '^([A-Za-z]+)', 1)) AS VARCHAR), 2, '0'),
            '-',
            lpad(regexp_extract(s, '\\b(\\d{{1,2}})\\b', 1), 2, '0')) AS DATE))),
        list_transform(regexp_extract_all({text}, '{SEMESTER}', 0),
          s -> make_date(
            CAST(regexp_extract(s, '(\\d{{4}})', 1) AS INTEGER),
            CASE regexp_extract(s, '^([A-Za-z]+)', 1) {season_whens} END,
            CASE regexp_extract(s, '^([A-Za-z]+)', 1) {season_day_whens} END))),
      d -> year(d) >= 1990 AND year(d) <= 2050)"""


def sql_recency_select(text: str, as_of: str = AS_OF) -> str:
    """SELECT fragment producing the recency columns from ``{text}``;
    ``as_of`` mirrors :func:`recency_cols` (same pinned default)."""
    dates = sql_dates(text)
    most = f"list_aggregate({dates}, 'max')"
    days = f"date_diff('day', {most}, DATE '{as_of}')"
    return f"""
           len({dates}) AS date_count,
           CAST({most} AS VARCHAR) AS most_recent_date,
           CAST({days} AS INTEGER) AS days_since_update,
           coalesce({days} <= 365, FALSE) AS has_recent_content,
           coalesce({days} <= 30, FALSE) AS has_very_recent_content"""


def sql_score2(text_lower: str, patterns: list[str]) -> str:
    terms = " + ".join(
        f"len(regexp_extract_all({text_lower}, '{p.replace(chr(39), chr(39) * 2)}', 0))"
        for p in patterns
    )
    return f"CAST(2 * ({terms}) AS BIGINT)"


def sql_academic_select(text: str, url: str) -> str:
    tl, ul = f"lower({text})", f"lower({url})"
    score_exprs = {}
    for fam in FAMILY_ORDER:
        base = sql_score2(tl, INDICATOR_FAMILIES[fam])
        hit = " OR ".join(f"contains({ul}, '{frag}')" for frag in URL_BOOSTS[fam])
        score_exprs[fam] = (
            f"CASE WHEN {hit} THEN CAST(({base}) * 3 // 2 AS BIGINT) "
            f"ELSE {base} END"
        )
    best = "greatest(" + ", ".join(score_exprs[f] for f in FAMILY_ORDER) + ")"
    ctype = "'general'"
    for fam in reversed(FAMILY_ORDER):
        ctype = (
            f"CASE WHEN ({score_exprs[fam]}) = ({best}) THEN '{fam}' "
            f"ELSE {ctype} END"
        )
    cols = ",\n".join(
        f"           {score_exprs[f]} AS {f}_score2" for f in FAMILY_ORDER
    )
    return f"""
{cols},
           CASE WHEN ({best}) < 4 THEN 'general' ELSE ({ctype}) END
             AS content_type,
           CAST(CASE WHEN ({best}) < 4 THEN 0
                     ELSE least(({best}) * 50, 1000) END AS BIGINT)
             AS confidence_milli,
           CASE WHEN regexp_extract({text}, '{SEMESTER}', 0) <> ''
                THEN regexp_extract({text}, '{SEMESTER}', 0) END AS semester"""
