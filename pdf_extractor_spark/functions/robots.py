"""Robots Exclusion Protocol (RFC 9309) filtering for crawl corpora.

A crawl pipeline must honor each host's ``robots.txt`` before keeping
a capture.  This module has a real REP parser — group structure
(``User-agent`` stanzas), ``Allow``/``Disallow`` rules, comments,
``*`` wildcards and the ``$`` end anchor — and a Spark stage that
applies the rules to a URL column with RFC precedence: the rule with
the LONGEST path pattern wins, and on a tie ``Allow`` wins
(RFC 9309 §2.2.2).

Precedence is encoded as one integer, ``priority = 2 * octet-length
of the pattern + (1 if allow)``, so "longest match, allow breaks
ties" is just ``max(priority)`` and the verdict is ``max % 2 == 1`` —
a plain partially-aggregable MAX both engines evaluate identically
(no argmax/struct-ordering divergence to worry about).

Pattern matching: REP patterns are path prefixes with ``*``
wildcards and an optional ``$`` anchor — exactly SQL ``LIKE`` after
escaping ``%``/``_``, mapping ``*`` → ``%``, and appending ``%``
unless anchored.  Spark and DuckDB ``LIKE`` semantics coincide, so
the match predicate is an engine twin by construction.

Scale shape (100 TB contract): the parsed rule table is tiny (rules
per registered host, thousands at most after grouping by profile) —
it broadcasts; host/path extraction is a narrow map; the match join
is a BroadcastHashJoin on the host key with the LIKE as its residual;
the verdict MAX is partially aggregable, so the one exchange carries
a single fixed-width row per document.  Text is never read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# --------------------------------------------------------- REP parser


def _directive_lines(text: str):
    """Logical robots.txt lines → (directive-lowercased, value) —
    the ONE line tokenizer (comment strip, first-colon split, key
    fold, whitespace trim) every robots parser consumes, so
    comment/whitespace handling cannot drift between them."""
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, val = line.partition(":")
        if not sep:
            continue
        yield key.strip().lower(), val.strip()


def _scan_groups(
    text: str,
) -> list[tuple[list[str], list[tuple[str, str]]]]:
    """robots.txt → [(agents, [(directive, value), …])] — the ONE
    group scanner both :func:`parse_robots` and
    :func:`parse_crawl_delay` fold over, so RFC 9309 group semantics
    (consecutive ``User-agent`` lines open one group; directives
    belong to every agent named above them; comments stripped;
    directives before any group dropped) cannot drift between the
    rule and delay readers."""
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    cur_agents: list[str] = []
    cur_dirs: list[tuple[str, str]] = []
    in_agent_run = False
    for key, val in _directive_lines(text):
        if key == "user-agent":
            if not in_agent_run and cur_agents:
                groups.append((cur_agents, cur_dirs))
                cur_agents, cur_dirs = [], []
            cur_agents.append(val.lower())
            in_agent_run = True
        else:
            in_agent_run = False
            if cur_agents:
                cur_dirs.append((key, val))
    if cur_agents:
        groups.append((cur_agents, cur_dirs))
    return groups


def _matching_groups(
    groups: list[tuple[list[str], list[tuple[str, str]]]], agent: str
) -> list[list[tuple[str, str]]]:
    """Directive lists of every group matching the agent — the exact
    agent name beats the ``*`` fallback; all matching groups combine
    (RFC 9309 §2.2.1: a second matching stanza ADDS, it is not
    shadowed by the first)."""
    for want in (agent.lower(), "*"):
        matched = [dirs for agents, dirs in groups if want in agents]
        if matched:
            return matched
    return []


def parse_robots(text: str, agent: str = "*") -> list[tuple[str, bool]]:
    """robots.txt → [(path_pattern, allow)] for the given agent.

    RFC 9309 group semantics via :func:`_scan_groups` /
    :func:`_matching_groups`; unknown directives are ignored; an
    empty-pattern rule is meaningless and dropped."""
    return [
        (val, key == "allow")
        for dirs in _matching_groups(_scan_groups(text), agent)
        for key, val in dirs
        if key in ("allow", "disallow") and val
    ]


def parse_crawl_delay(text: str, agent: str = "*") -> int | None:
    """``Crawl-delay`` seconds for the agent, or None when unset.

    Crawl-delay is not part of RFC 9309 (it lists it among directives
    crawlers MAY support) but large engines honor it, so the fetch
    scheduler reads it.  Group selection is the same
    :func:`_matching_groups` rule as :func:`parse_robots`, and when
    merged groups disagree the LARGEST delay wins — the conservative
    merge, matching the spirit of combining restrictions.  Garbage
    and negative values are ignored (a negative delay would corrupt
    fetch offsets downstream)."""
    delays = []
    for dirs in _matching_groups(_scan_groups(text), agent):
        for key, val in dirs:
            if key != "crawl-delay":
                continue
            try:
                v = int(float(val))
            except ValueError:
                continue
            if v >= 0:
                delays.append(v)
    return max(delays) if delays else None


def parse_sitemap_urls(text: str) -> list[str]:
    """``Sitemap:`` directives, in file order.

    Per sitemaps.org (and RFC 9309's treatment of other records) the
    directive is INDEPENDENT of user-agent groups — it may appear
    anywhere in the file, including before any group, and applies to
    all agents — so this folds over :func:`_directive_lines` without
    group structure.  The value is an absolute URL and is NOT
    lowercased (URL paths are case-sensitive; only the directive
    name is case-insensitive)."""
    return [val for key, val in _directive_lines(text)
            if key == "sitemap" and val]


def pattern_to_like(pattern: str) -> str:
    """REP path pattern → SQL LIKE pattern (twin semantics in Spark
    and DuckDB): escape LIKE metacharacters, ``*`` → ``%``, trailing
    ``$`` anchors (no trailing ``%``)."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    out = (pattern.replace("\\", "\\\\").replace("%", "\\%")
           .replace("_", "\\_").replace("*", "%"))
    return out if anchored else out + "%"


def rule_priority(pattern: str, allow: bool) -> int:
    """RFC 9309 §2.2.2 as one integer: longest pattern wins, allow
    breaks ties."""
    return 2 * len(pattern.encode()) + (1 if allow else 0)


# ----------------------------------------- frozen per-profile fixtures
#
# Two host profiles, written as REAL robots.txt documents and parsed
# through parse_robots() — the catalog query's rule table is the
# parser's output, so the driver row gates the parser too.

ROBOTS_PROFILE_A = """\
# profile A: selective
Sitemap: https://h.example/sitemap-index.xml
User-agent: *
Disallow: /private/
Allow: /private/published/
Disallow: /*.tmp$
Crawl-delay: 5
Allow: /

User-agent: badbot
Disallow: /
"""

ROBOTS_PROFILE_B = """\
# profile B: closed except articles
User-agent: archiver
User-agent: *
Disallow: /
Allow: /articles/
Crawl-delay: 10
Sitemap: https://h.example/SiteMap-B.xml
"""

PROFILES: tuple[tuple[int, str], ...] = (
    (0, ROBOTS_PROFILE_A),
    (1, ROBOTS_PROFILE_B),
)


DEFAULT_CRAWL_DELAY = 1  # polite floor when a host sets no delay


def profile_delays() -> dict[int, int]:
    """{profile: crawl-delay seconds} via the real parser, with the
    polite default applied ONLY where a profile sets none — an
    explicit ``Crawl-delay: 0`` (host permits full speed) is honored,
    not coerced to the default."""
    out = {}
    for profile, text in PROFILES:
        d = parse_crawl_delay(text)
        out[profile] = DEFAULT_CRAWL_DELAY if d is None else d
    return out


def profile_rules() -> list[tuple[int, str, int]]:
    """[(profile, like_pattern, priority)] — the broadcastable rule
    table, derived from the robots.txt fixtures via the real
    parser."""
    rows = []
    for profile, text in PROFILES:
        for pattern, allow in parse_robots(text):
            rows.append((
                profile,
                pattern_to_like(pattern),
                rule_priority(pattern, allow),
            ))
    return rows


# ----------------------------------------------- synthesized crawl URLs
#
# host profile = ({c} div 7) % 2, five path shapes in rotation — same
# expression family as blocklist.synth_block_url.  The ``{c}``
# templates are the single source of truth: this module instantiates
# them over doc_id, functions/frontier.py over its candidate ids —
# one definition, both dialects, no drift between the two oracles.

SPARK_HOST_T = ("concat('site', cast(pmod({c} div 7, 20) as string),"
                " '.example')")
SPARK_PROFILE_T = "cast(pmod({c} div 7, 2) as int)"
SPARK_PATH_T = (
    "CASE pmod({c}, 5) "
    "WHEN 0 THEN concat('/private/page', cast({c} as string), '.html') "
    "WHEN 1 THEN concat('/private/published/p', cast({c} as string), "
    "'.html') "
    "WHEN 2 THEN concat('/files/f', cast({c} as string), '.tmp') "
    "WHEN 3 THEN concat('/articles/a', cast({c} as string), '.html') "
    "ELSE concat('/index', cast({c} as string), '.html') END"
)

DUCK_HOST_T = "'site' || CAST(({c} // 7) % 20 AS VARCHAR) || '.example'"
DUCK_PROFILE_T = "CAST(({c} // 7) % 2 AS INT)"
DUCK_PATH_T = (
    "CASE {c} % 5 "
    "WHEN 0 THEN '/private/page' || CAST({c} AS VARCHAR) || '.html' "
    "WHEN 1 THEN '/private/published/p' || CAST({c} AS VARCHAR) || '.html' "
    "WHEN 2 THEN '/files/f' || CAST({c} AS VARCHAR) || '.tmp' "
    "WHEN 3 THEN '/articles/a' || CAST({c} AS VARCHAR) || '.html' "
    "ELSE '/index' || CAST({c} AS VARCHAR) || '.html' END"
)

SPARK_HOST = SPARK_HOST_T.format(c="doc_id")
SPARK_PROFILE = SPARK_PROFILE_T.format(c="doc_id")
SPARK_PATH = SPARK_PATH_T.format(c="doc_id")
DUCK_HOST = DUCK_HOST_T.format(c="doc_id")
DUCK_PROFILE = DUCK_PROFILE_T.format(c="doc_id")
DUCK_PATH = DUCK_PATH_T.format(c="doc_id")


# ------------------------------------------------------- spark stage


def robots_filter_report(docs: DataFrame) -> DataFrame:
    """(doc_id, host, path, allowed): RFC 9309 verdict per document
    URL against its host profile's parsed robots rules."""
    spark = docs.sparkSession
    rules = spark.createDataFrame(
        profile_rules(), "profile int, like_pattern string, priority int"
    )
    urls = docs.select(
        "doc_id",
        F.expr(SPARK_HOST).alias("host"),
        F.expr(SPARK_PROFILE).alias("profile"),
        F.expr(SPARK_PATH).alias("path"),
    )
    matched = urls.join(
        F.broadcast(rules),
        on=[urls.profile == rules.profile,
            F.expr("path like like_pattern")],
        how="left",
    )
    return (
        matched.groupBy("doc_id", "host", "path")
        .agg(F.max("priority").alias("best"))
        .select(
            "doc_id", "host", "path",
            # no matching rule (best IS NULL) → allowed, per RFC
            F.coalesce(
                F.expr("pmod(best, 2) = 1"), F.lit(True)
            ).alias("allowed"),
        )
    )


def duck_robots_sql(source: str = "documents") -> str:
    """DuckDB twin of :func:`robots_filter_report` — same parsed rule
    table inlined as VALUES, same LIKE patterns, same MAX-priority
    verdict."""
    rows = ", ".join(
        "({}, '{}', {})".format(p, lp.replace("'", "''"), pr)
        for p, lp, pr in profile_rules()
    )
    return f"""
WITH rules(profile, like_pattern, priority) AS (VALUES {rows}),
urls AS (
  SELECT doc_id,
         {DUCK_HOST} AS host,
         {DUCK_PROFILE} AS profile,
         {DUCK_PATH} AS path
  FROM {source}
)
SELECT u.doc_id, u.host, u.path,
       coalesce(max(r.priority) % 2 = 1, TRUE) AS allowed
FROM urls u
LEFT JOIN rules r
  ON u.profile = r.profile
  AND u.path LIKE r.like_pattern ESCAPE '\\'
GROUP BY u.doc_id, u.host, u.path
"""
