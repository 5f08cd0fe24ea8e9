"""URL-level curation operators for web corpora.

A crawl sees the same page under many spellings (scheme, ``www.``,
tracking query params, trailing slashes, letter case); URL-level dedup
is the cheapest dedup a web pipeline runs — it fires BEFORE any text
ever leaves storage — and domain blocklists (UT1-style) are the
standard first content filter.  The reference engine is
single-document and has no crawl surface (SURVEY.md section 2.7 covers
only intra-page dedup); these are the web-scale extension.

Canonicalization contract (applied in order, all RE2-parity patterns
so the DuckDB oracles state the identical transforms):

1. lowercase
2. strip a leading ``http://`` / ``https://`` scheme
3. strip a leading ``www.``
4. cut at the first ``?`` or ``#`` (query string + fragment)
5. strip trailing ``/``

The registered domain is the canonical URL up to the first ``/``.
"""
from __future__ import annotations

import re

import pandas as pd

from doc_ocr_ray.util import coarse_part, typed_if_empty

# ordered (pattern, replacement) chain — ONE definition, interpolated
# into the SQL oracle via canonical_url_sql() so the two sides cannot
# drift (the pii_redact discipline applied to URLs).  Whitespace edges
# strip FIRST (explicit [\t\n\f\r ] class per the repo's oracle
# whitespace contract): beyond hygiene for scraped urls, it guarantees
# the string no longer ends in \n when the later $-anchored rules run
# — Python re's $ matches before a final newline, RE2/DuckDB's does
# not, and that is the only place the two engines' $ semantics differ.
_CANON_RULES = (
    (r"^[\t\n\f\r ]+", ""),
    (r"[\t\n\f\r ]+$", ""),
    (r"^https?://", ""),
    (r"^www\.", ""),
    (r"[?#].*$", ""),
    (r"/+$", ""),
)


def canonicalize_urls(batch: pd.DataFrame,
                      url_col: str = "url") -> pd.DataFrame:
    """Append ``canon_url`` and ``domain`` columns (vectorized pandas
    str kernels, no per-row loop)."""
    canon = batch[url_col].fillna("").str.lower()
    for pat, rep in _CANON_RULES:
        canon = canon.str.replace(pat, rep, regex=True)
    out = batch.copy()
    out["canon_url"] = canon
    out["domain"] = canon.str.replace(r"/.*$", "", regex=True)
    return out


def canonical_url_sql(expr: str) -> str:
    """DuckDB expression computing the same canonical URL from ``expr``
    (RE2 semantics on both sides; each rule matches at most once, so
    DuckDB's replace-first default equals pandas' replace-all)."""
    sql = f"lower({expr})"
    for pat, rep in _CANON_RULES:
        sql = f"regexp_replace({sql}, '{pat}', '{rep}')"
    return sql


def url_dedup(ds, url_col: str = "url", num_parts: int = 256):
    """Keep ONE document per canonical URL (min doc_id survivor).
    Output: (doc_id, url, canon_url).

    Shape: per-batch canonicalize + in-batch keep-first combiner (a
    hot URL crawled millions of times ships one candidate per batch);
    ONE coarse canon-hash exchange whose keep-first groups on the
    canonical-URL STRING (short by construction — unlike document
    text, URLs are cheap to ship), so a partition-hash collision can
    never merge distinct URLs.  Text never rides this shuffle: run it
    on the (doc_id, url) projection and semi-join survivors back.
    """
    def key(batch: pd.DataFrame) -> pd.DataFrame:
        out = canonicalize_urls(batch, url_col)
        out = out[["doc_id", url_col, "canon_url"]].sort_values("doc_id")
        out = out.groupby("canon_url", sort=False).head(1)
        out["part"] = coarse_part(out["canon_url"], num_parts)
        return typed_if_empty(out)

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        g = g.groupby("canon_url", sort=False).head(1)
        return g[["doc_id", url_col, "canon_url"]].reset_index(drop=True)

    return (ds.map_batches(key, batch_format="pandas")
            .groupby("part").map_groups(keep_first,
                                        batch_format="pandas"))


def filter_blocked_domains(ds, blocked_domains, url_col: str = "url"):
    """Drop documents whose URL's registered domain is on a blocklist.

    The blocklist is broadcast ONCE via ``ray.put`` (UT1-scale lists
    run to millions of domains — a closure capture would re-pickle the
    set into every task; the object-store copy is shared per node) and
    membership-checked in one shuffle-free ``map_batches`` — the
    ``decontaminate`` shape applied to domains.  The deserialized
    frozenset is cached per worker process keyed by the ref (a
    frozenset is not zero-copy, so a bare ``ray.get`` per batch would
    re-unpickle the full list thousands of times).
    """
    import ray

    blocked_ref = ray.put(frozenset(blocked_domains))

    def drop(batch: pd.DataFrame) -> pd.DataFrame:
        key = blocked_ref.hex()
        blocked = _BLOCKLIST_CACHE.get(key)
        if blocked is None:
            _BLOCKLIST_CACHE.clear()      # one live blocklist per worker
            blocked = _BLOCKLIST_CACHE[key] = ray.get(blocked_ref)
        out = canonicalize_urls(batch, url_col)
        out = out[~out["domain"].isin(blocked)]
        return typed_if_empty(out.reset_index(drop=True))

    return ds.map_batches(drop, batch_format="pandas")


# worker-resident deserialized-blocklist cache (pipelines/extract.py
# _STAGE_CACHE pattern); keyed by ObjectRef hex, keep-latest-only.
# robots rules get their OWN cache: a politeness pipeline composes
# domain blocklist + robots in one fused task, and a shared
# keep-latest slot would make the two stages evict each other every
# batch (re-unpickling multi-million-entry structures each time)
_BLOCKLIST_CACHE: dict = {}
_ROBOTS_CACHE: dict = {}


def _robots_pattern(pattern: str):
    """Compile one REP path pattern -> ``(raw_len, is_regex,
    matcher)``.  Google REP wildcard semantics: ``*`` matches any
    character run (including ``/``); a TRAILING ``$`` anchors the end
    of the path (``$`` anywhere else is a literal).  Specificity is
    the RAW pattern length (wildcards count — the google/robotstxt
    priority rule).  Plain prefixes stay on the ``startswith`` fast
    path; wildcard/anchored patterns become one anchored regex."""
    if "*" not in pattern and not pattern.endswith("$"):
        return (len(pattern), False, pattern)
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(seg) for seg in body.split("*"))
    return (len(pattern), True,
            re.compile(rx + (r"\Z" if anchored else "")))


def robots_classify(ds, rules, url_col: str = "url"):
    """Robots-exclusion classification — the crawl-politeness filter
    that sits next to the domain blocklist.  ``rules`` is an iterable
    of ``(domain, path_pattern, allow)`` triples implementing the
    Google REP matching rules: plain path prefixes, ``*`` wildcards
    (any character run), and a trailing ``$`` end anchor (see
    :func:`_robots_pattern`); patterns must start with ``/`` or
    ``*``.  Per URL, the MOST SPECIFIC matching rule (longest raw
    pattern) among the url's domain's rules decides; an allow and a
    disallow of equal specificity tie to ALLOW (Google REP tie rule);
    no matching rule means allowed.

    Output appends ``canon_url``, ``domain``, ``path`` and
    ``allowed`` (0/1).  The rule set is broadcast once via
    ``ray.put`` grouped by domain (robots corpora are
    domain-partitioned by nature) and applied in one shuffle-free
    ``map_batches``; per URL only its own domain's rules are scanned.
    """
    import ray

    grouped: dict = {}
    for domain, prefix, allow in rules:
        if not prefix.startswith(("/", "*")):
            raise ValueError("robots path patterns must start with "
                             "'/' or '*'")
        # rule domains must match URL-side domains, which come out of
        # canonicalize_urls lowercased AND www-stripped — apply the
        # same normalization or 'www.example.com' rules silently
        # never match
        dom = domain.lower()
        if dom.startswith("www."):
            dom = dom[4:]
        plen, is_rx, matcher = _robots_pattern(prefix)
        grouped.setdefault(dom, []).append((plen, is_rx, matcher,
                                            int(allow)))
    rules_ref = ray.put(grouped)

    def classify(batch: pd.DataFrame) -> pd.DataFrame:
        key = rules_ref.hex()
        rls = _ROBOTS_CACHE.get(key)
        if rls is None:
            _ROBOTS_CACHE.clear()
            rls = _ROBOTS_CACHE[key] = ray.get(rules_ref)
        out = canonicalize_urls(batch, url_col)
        slash = out["canon_url"].str.find("/")
        out["path"] = [
            (u[i:] if i >= 0 else "/")
            for u, i in zip(out["canon_url"], slash)]
        allowed = []
        for dom, path in zip(out["domain"], out["path"]):
            best = (-1, 1)          # (specificity, allow): default allow
            for plen, is_rx, matcher, allow in rls.get(dom, ()):
                hit = (matcher.match(path) is not None if is_rx
                       else path.startswith(matcher))
                if hit:
                    cand = (plen, allow)
                    # more specific wins; ties: allow (1) wins
                    if cand > best:
                        best = cand
            allowed.append(best[1])
        out["allowed"] = pd.Series(allowed, dtype="int64").to_numpy()
        return typed_if_empty(out.reset_index(drop=True))

    return ds.map_batches(classify, batch_format="pandas")
