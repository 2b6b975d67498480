"""Domain-aware curation: URL/host/registrable-domain extraction,
per-domain caps, and blocklist filtering.

Extension beyond the reference surface (which has no web-corpus
notion): the standard pretraining-pipeline lever a 100 TB web crawl
needs — balance the corpus so no single registrable domain dominates
(per-domain caps) and drop known-bad domains (blocklist). See e.g.
the C4 / RefinedWeb / Dolma pipeline descriptions (public papers);
the operators here are the Spark-native equivalents.

Scale design:

- URL parsing and domain extraction are row-local JVM expressions
  (``parse_url`` + split/slice on the host) — zero shuffle, zero
  Python;
- the blocklist filter is a broadcast LEFT ANTI join (blocklists are
  KB-to-MB sized — always the small side);
- per-domain caps reuse :func:`..operators.pairs.cap_per_key`
  (row_number over a domain-partitioned window, WindowGroupLimit
  pre-limits per partition before the exchange, no global sort).

The testdata ``documents`` table has no url column, so the gated
queries synthesize a deterministic URL per document from its
``source``/``doc_id``/``lang`` (md5-seeded choices, replicated by the
DuckDB oracle). Real deployments pass their own url column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Multi-label public suffixes the registrable-domain rule recognises
#: by default. A tiny built-in stand-in for the real Public Suffix
#: List (public, https://publicsuffix.org) — pass the full list via
#: ``registrable_domain(..., suffixes=...)`` in production.
MULTI_LABEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "com.au", "co.jp", "com.br", "co.in",
)

_TLDS = ("com", "org", "net", "io", "co.uk")
_SUBS = ("www", "blog", "docs", "shop")


def _pick(options: tuple[str, ...], key: Column) -> Column:
    """Deterministic cross-engine pick: ascii of the first md5 hex char
    of ``key`` modulo len(options) — DuckDB computes the identical
    value with ascii(substr(md5(k),1,1)) % n."""
    idx = F.ascii(F.substring(F.md5(key), 1, 1)) % len(options)
    pick = F.lit(options[0])
    for i, opt in enumerate(options[1:], start=1):
        pick = F.when(idx == i, F.lit(opt)).otherwise(pick)
    return pick


def synthesize_url(
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """Append a deterministic, well-formed ``url`` column:
    ``https://{sub}.{source}.{tld}/p/{doc_id}?ref={lang}`` where the
    subdomain is doc-seeded and the TLD source-seeded (so one source
    maps to exactly one registrable domain)."""
    sub = _pick(_SUBS, F.col(id_col).cast("string"))
    tld = _pick(_TLDS, F.col(source_col))
    return docs.withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            sub,
            F.lit("."),
            F.col(source_col),
            F.lit("."),
            tld,
            F.lit("/p/"),
            F.col(id_col).cast("string"),
            F.lit("?ref="),
            F.col(lang_col),
        ),
    )


def url_host(url: Column | str) -> Column:
    """Host part of a URL — JVM-side ``try_parse_url(url, 'HOST')``
    (the try_ form: malformed crawl URLs yield NULL instead of failing
    the job under ANSI mode — callers bucket or drop the NULLs)."""
    u = F.col(url) if isinstance(url, str) else url
    return F.try_parse_url(u, F.lit("HOST"))


def registrable_domain(
    host: Column | str,
    suffixes: tuple[str, ...] = MULTI_LABEL_SUFFIXES,
) -> Column:
    """Registrable domain (eTLD+1) of a host: the last two labels,
    or one more than the suffix length when the host ends in a
    recognised multi-label public suffix (``co.uk`` and friends).
    Row-local split/slice — no UDF.

    A host that IS a public suffix (e.g. host ``co.uk``) has no
    registrable domain — it returns NULL rather than reporting the
    bare suffix as its own domain (grouping every ``*.co.uk`` site's
    parent under one key would silently merge unrelated sites in
    per-domain caps/blocklists).

    ``suffixes`` is injectable so deployments can load the full
    Public Suffix List (public, https://publicsuffix.org) instead of
    the tiny built-in stand-in; entries may be any label depth
    (e.g. ``github.io`` → ``user.github.io`` is the registrable
    domain). NULL hosts stay NULL.
    """
    h = F.col(host) if isinstance(host, str) else host
    labels = F.split(h, r"\.")
    n = F.size(labels)
    is_suffix = F.lit(False)
    keep = F.least(n, F.lit(2))
    # longest-match-wins, as the PSL prescribes: apply shorter
    # suffixes first so a longer matching suffix overwrites the keep
    # width (e.g. a list with both 'io' and 'github.io')
    for suf in sorted(suffixes, key=lambda s: s.count(".")):
        width = suf.count(".") + 2
        is_suffix = is_suffix | (h == suf)
        keep = F.when(
            h.endswith("." + suf) & (n >= width), F.lit(width)
        ).otherwise(keep)
    return F.when(is_suffix, F.lit(None).cast("string")).otherwise(
        F.array_join(F.slice(labels, n - keep + 1, keep), ".")
    )


def parse_psl(text: str) -> list[tuple[str, str]]:
    """Parse Public Suffix List text (the real file format from
    https://publicsuffix.org/list/ — public data, MPL-2.0) into
    ``(key, kind)`` rules:

    - plain rule ``co.uk``            → ``("co.uk", "plain")``
    - wildcard rule ``*.ck``          → ``("ck", "wildcard")`` (the key
      is the concrete part; the ``*`` consumes exactly one more label)
    - exception rule ``!www.ck``      → ``("www.ck", "exception")``

    Comment lines (``//``) and blanks are skipped; both the ICANN and
    PRIVATE sections are kept (pipelines that want ICANN-only can
    slice the text before parsing). Keys are lowercased; punycode
    passes through untouched (hosts compare in their punycode form).
    """
    rules: list[tuple[str, str]] = []
    for raw in text.splitlines():
        line = raw.strip().lower()
        if not line or line.startswith("//"):
            continue
        line = line.split()[0]  # PSL allows trailing whitespace+junk
        if line.startswith("!"):
            rules.append((line[1:], "exception"))
        elif line.startswith("*."):
            rules.append((line[2:], "wildcard"))
        elif line == "*":
            # the default rule is implicit in the matcher; an explicit
            # top-level '*' adds nothing
            continue
        else:
            rules.append((line, "plain"))
    return rules


def psl_rules_df(spark, rules: list[tuple[str, str]] | str) -> DataFrame:
    """Rules table for :func:`registrable_domain_psl` —
    ``(key, rule_labels, pub_labels, is_exc)`` where ``key`` is the
    concrete label suffix a host-suffix equi-join can hit,
    ``rule_labels`` ranks longest-match-wins, and ``pub_labels`` is
    how many host labels the matched PUBLIC SUFFIX spans (wildcard =
    key+1, exception = key−1, plain = key). Accepts pre-parsed rules
    or raw PSL text."""
    if isinstance(rules, str):
        rules = parse_psl(rules)
    rows = []
    for key, kind in rules:
        k = key.count(".") + 1
        if kind == "wildcard":
            rows.append((key, k + 1, k + 1, False))
        elif kind == "exception":
            rows.append((key, k, k - 1, True))
        else:
            rows.append((key, k, k, False))
    return spark.createDataFrame(
        rows, "key string, rule_labels int, pub_labels int, is_exc boolean"
    )


def registrable_domain_psl(
    df: DataFrame,
    host_col: str = "host",
    rules: DataFrame | None = None,
    out_col: str = "domain",
) -> DataFrame:
    """Registrable domain (eTLD+1) under FULL Public Suffix List
    semantics — wildcard (``*.ck``) and exception (``!www.ck``) rules
    included, unlike the row-local :func:`registrable_domain` which
    handles plain multi-label suffixes only. Appends ``out_col``.

    Algorithm (publicsuffix.org spec): every label-suffix of the host
    is a join candidate; among matching rules exceptions win, then the
    most labels; no match falls back to the implicit ``*`` rule (the
    bare TLD is the public suffix). The registrable domain is the
    public suffix plus one label — NULL when the host IS a public
    suffix (or shorter).

    Scale shape: the PSL is ~10k rows → BROADCAST equi-join. The match
    runs over DISTINCT hosts (a web crawl has orders of magnitude
    fewer hosts than pages), then joins back to the rows — one
    suffix-explode (≤ label-count rows per distinct host), one
    broadcast join, one groupBy, one hash join back. Zero Python.
    """
    if rules is None:
        raise ValueError(
            "pass rules=psl_rules_df(spark, psl_text) — there is no "
            "bundled PSL snapshot (ship the current public file with "
            "your deployment)"
        )
    h = F.lower(F.col(host_col))
    hosts = df.select(h.alias("__h")).where(h.isNotNull()).distinct()
    labels = F.split(F.col("__h"), r"\.")
    k = F.size(labels)
    cand = hosts.select(
        "__h",
        k.alias("__k"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.array_join(
                    F.slice(labels, k - i + 1, i), "."
                ),
            )
        ).alias("__suffix"),
    )
    matched = (
        cand.join(
            F.broadcast(rules),
            (cand["__suffix"] == rules["key"])
            # a rule only matches hosts with at least as many labels as
            # the rule (publicsuffix.org spec) — without this a wildcard
            # '*.kobe.jp' would match the host 'kobe.jp' itself and, via
            # longest-rule-wins, outrank the plain 'jp' rule
            & (cand["__k"] >= rules["rule_labels"]),
        )
        # prevailing rule: exceptions first, then longest
        .groupBy("__h", "__k")
        .agg(
            F.max(
                F.struct(
                    F.col("is_exc").cast("int").alias("e"),
                    F.col("rule_labels").alias("r"),
                    F.col("pub_labels").alias("p"),
                )
            ).alias("__best")
        )
        .select("__h", "__k", F.col("__best.p").alias("__pub"))
    )
    resolved = (
        hosts.join(matched, ["__h"], "left")
        .select(
            "__h",
            F.coalesce(F.col("__pub"), F.lit(1)).alias("__pub"),  # '*' rule
        )
        .select(
            "__h",
            F.when(
                F.size(F.split(F.col("__h"), r"\.")) >= F.col("__pub") + 1,
                F.array_join(
                    F.slice(
                        F.split(F.col("__h"), r"\."),
                        F.size(F.split(F.col("__h"), r"\."))
                        - F.col("__pub"),
                        F.col("__pub") + 1,
                    ),
                    ".",
                ),
            ).alias(out_col),
        )
    )
    return df.join(resolved, h == F.col("__h"), "left").drop("__h")


#: query parameters stripped by URL canonicalization — the standard
#: tracking/attribution junk crawl pipelines normalize away (public
#: lists, e.g. the utm_* convention); injectable per deployment.
TRACKING_PARAMS: tuple[str, ...] = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "gclid", "fbclid", "ref_src",
)


def canonicalize_url(
    url: Column | str,
    tracking: tuple[str, ...] = TRACKING_PARAMS,
    strip_www: bool = True,
) -> Column:
    """Canonical form of a URL for URL-level dedup (the keep-one-doc-
    per-page lever of crawl curation, beside content dedup):

    - scheme and host lowercased; one leading ``www.`` stripped;
    - fragment dropped; trailing ``/`` on the path dropped;
    - tracking query parameters removed (``tracking``, injectable)
      and the surviving parameters SORTED so param order never splits
      a page into two keys;
    - malformed URLs (no parsable host/scheme) canonicalize to NULL —
      callers quarantine rather than merge unknowns.

    Row-local JVM expressions end to end (try_parse_url + regexp +
    array ops) — zero Python, zero shuffle; the DuckDB twin is
    ``canonicalize_url_sql``.
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(
        F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    )
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_replace(
        F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit("")),
        r"/+$",
        "",
    )
    q = F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit(""))
    params = F.filter(
        F.split(q, "&"),
        lambda p: (F.length(p) > 0)
        & ~F.element_at(F.split(p, "="), 1).isin(*tracking),
    )
    q2 = F.array_join(F.array_sort(params), "&")
    return F.when(
        host.isNull() | (host == "") | (scheme == ""),
        F.lit(None).cast("string"),
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(q2 == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), q2)
            ),
        )
    )


def canonicalize_url_sql(
    expr: str,
    tracking: tuple[str, ...] = TRACKING_PARAMS,
) -> str:
    """DuckDB twin of :func:`canonicalize_url` (regexp part
    extraction instead of parse_url; identical canonical rule)."""
    tr = ", ".join(f"'{t}'" for t in tracking)
    scheme = (
        f"lower(regexp_extract({expr},"
        f" '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    )
    host = (
        f"regexp_replace(regexp_replace(lower(regexp_extract({expr},"
        f" '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),"
        f" ':[0-9]+$', ''), '^www\\.', '')"
    )
    path = (
        f"regexp_replace(regexp_extract({expr},"
        f" '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1),"
        f" '/+$', '')"
    )
    q2 = (
        f"array_to_string(list_sort(list_filter("
        f"string_split(regexp_extract({expr}, '\\?([^#]*)', 1), '&'),"
        f" p -> length(p) > 0"
        f" AND NOT list_contains([{tr}], string_split(p, '=')[1]))), '&')"
    )
    return (
        f"(CASE WHEN {host} = '' OR {scheme} = '' THEN NULL"
        f" ELSE {scheme} || '://' || {host} || {path}"
        f" || (CASE WHEN {q2} = '' THEN '' ELSE '?' || {q2} END) END)"
    )


def synthesize_messy_urls(
    docs: DataFrame, id_col: str = "doc_id", source_col: str = "source"
) -> DataFrame:
    """Deterministic MESSY url per document — md5-seeded variants of
    scheme case, www prefix, trailing slash, tracking params, param
    order, and fragments, all collapsing to the same canonical
    ``https://{source}.{tld}/p/{doc_id % 10}?a=1&b=2`` so URL-level
    dedup has real collision groups. Replicated verbatim by the
    oracle (_MESSY_URL_CTE in plans/q_text.py)."""

    def bit(n: int) -> Column:
        return (
            F.ascii(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"m{n}:"), F.col(id_col).cast("string")
                        )
                    ),
                    1,
                    1,
                )
            )
            % 2
        )

    tld = _pick(_TLDS, F.col(source_col))
    scheme = F.when(bit(1) == 1, F.lit("HTTPS")).otherwise(F.lit("https"))
    www = F.when(bit(2) == 1, F.lit("www.")).otherwise(F.lit(""))
    slash = F.when(bit(3) == 1, F.lit("/")).otherwise(F.lit(""))
    query = F.when(
        bit(4) == 1, F.lit("?b=2&utm_source=feed&a=1")
    ).otherwise(F.lit("?a=1&b=2"))
    frag = F.when(bit(1) == 1, F.lit("#sec")).otherwise(F.lit(""))
    return docs.select(
        F.col(id_col),
        F.concat(
            scheme, F.lit("://"), www, F.col(source_col), F.lit("."), tld,
            F.lit("/p/"), F.pmod(F.col(id_col), F.lit(10)).cast("string"),
            slash, query, frag,
        ).alias("url"),
    )


def url_dedup(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level dedup groups: one row per canonical URL with the
    keeper (minimum id) and the copy count. Rows whose URL does not
    canonicalize (NULL) are EXCLUDED — unknown pages must be
    quarantined, not merged into one mega-group (the NULL-key lesson
    of the streaming domain cap)."""
    c = canonicalize_url(url_col)
    return (
        docs.select(c.alias("canonical_url"), F.col(id_col))
        .where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def domain_blocklist_filter(
    docs: DataFrame, blocked: list[str], domain_col: str = "domain"
) -> DataFrame:
    """Drop rows whose registrable domain is blocklisted — broadcast
    LEFT ANTI join (the blocklist is always the small side)."""
    spark = docs.sparkSession
    bl = spark.createDataFrame(
        [(d,) for d in blocked], f"{domain_col} string"
    )
    return docs.join(F.broadcast(bl), domain_col, "left_anti")


def cap_per_domain(
    docs: DataFrame,
    n: int,
    domain_col: str = "domain",
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``n`` documents per registrable domain
    (deterministic by ``order_col``) — delegates to
    :func:`..operators.pairs.cap_per_key`."""
    from semantic_ann_in_data_lake_spark.operators.pairs import cap_per_key

    return cap_per_key(docs, domain_col, n, order_col=order_col)
