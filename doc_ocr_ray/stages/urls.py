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

import numpy as np
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


# ------------------------------------------------------------ sitemaps
# Sitemap-protocol subset (sitemaps.org 0.9): <urlset> of <url>
# entries and <sitemapindex> of <sitemap> entries, fields <loc>
# (required), <lastmod> (W3C datetime), <priority> (0.0-1.0).  The
# spec forbids nested <url>/<sitemap> elements and requires
# entity-escaped URLs, so a linear block scan with compiled patterns
# is exact for conforming files and degrades predictably (skip the
# malformed entry, keep the rest) on the junk a crawler actually
# meets — no DTD/entity machinery means no billion-laughs surface.
_SM_BLOCK = re.compile(
    r"<(url|sitemap)\b[^>]*>(.*?)</\1\s*>", re.DOTALL | re.IGNORECASE)
_SM_FIELD = {
    name: re.compile(
        rf"<{name}\b[^>]*>(.*?)</{name}\s*>", re.DOTALL | re.IGNORECASE)
    for name in ("loc", "lastmod", "priority")}
_SM_CDATA = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.DOTALL)
_SM_ENT = re.compile(r"&(amp|lt|gt|quot|apos|#x?[0-9a-fA-F]+);")
_SM_ROOT = re.compile(r"<\s*(urlset|sitemapindex)\b", re.IGNORECASE)
_SM_WS = re.compile(r"[\t\n\f\r ]+")
_SM_DECIMAL = re.compile(r"^[+-]?(?:\d+\.?\d*|\.\d+)$")
_SM_LASTMOD = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})"
    r"(?:T(\d{2}):(\d{2})(?::(\d{2})(?:\.\d+)?)?"
    r"(Z|[+-]\d{2}:\d{2}))?$")


def _sm_text(raw: str) -> str:
    """Field text -> value: CDATA sections contribute their content
    LITERALLY (that is what CDATA is for — no entity decoding
    inside), text outside them entity-decodes, adjacent pieces
    concatenate, edges strip the house whitespace class."""
    def ent(mm):
        e = mm.group(1)
        if e == "amp":
            return "&"
        if e == "lt":
            return "<"
        if e == "gt":
            return ">"
        if e == "quot":
            return '"'
        if e == "apos":
            return "'"
        try:
            cp = int(e[2:], 16) if e[1] in "xX" else int(e[1:])
            return chr(cp)
        except (ValueError, OverflowError):
            return mm.group(0)

    parts = []
    pos = 0
    for m in _SM_CDATA.finditer(raw):
        parts.append(_SM_ENT.sub(ent, raw[pos:m.start()]))
        parts.append(m.group(1))               # literal, no decode
        pos = m.end()
    parts.append(_SM_ENT.sub(ent, raw[pos:]))
    return "".join(parts).strip("\t\n\f\r ")


def _sm_lastmod_us(value: str):
    """W3C-datetime subset -> epoch microseconds (int) or None:
    date-only is midnight UTC; an explicit offset shifts to UTC.
    Civil-to-epoch via the days-from-civil algorithm (pure integer,
    no datetime lib, same formula the SQL twin can state)."""
    m = _SM_LASTMOD.match(value)
    if m is None:
        return None
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if not 1 <= mo <= 12:
        return None
    leap = y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)
    mdays = (31, 29 if leap else 28, 31, 30, 31, 30,
             31, 31, 30, 31, 30, 31)[mo - 1]
    if not 1 <= d <= mdays:
        return None
    hh = int(m.group(4) or 0)
    mi = int(m.group(5) or 0)
    ss = int(m.group(6) or 0)
    if hh > 23 or mi > 59 or ss > 59:
        return None
    tz = m.group(7)
    # days-from-civil (Howard Hinnant's algorithm, public domain)
    yy = y - (mo <= 2)
    era = (yy if yy >= 0 else yy - 399) // 400
    yoe = yy - era * 400
    doy = (153 * (mo + (-3 if mo > 2 else 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    days = era * 146097 + doe - 719468
    us = ((days * 86400) + hh * 3600 + mi * 60 + ss) * 1_000_000
    if tz and tz != "Z":
        sign = 1 if tz[0] == "+" else -1
        us -= sign * (int(tz[1:3]) * 3600 + int(tz[4:6]) * 60) * 1_000_000
    return us


def sitemap_entries(xml: str):
    """Parse one sitemap document -> (kind, entries): kind is 'url'
    (urlset), 'sitemap' (sitemapindex) or '' (unrecognized root);
    entries are dicts with loc / lastmod_us / priority_milli (None
    when absent or invalid).  Entries without a <loc> are skipped;
    priority clamps to the spec's 0.0-1.0 then lands on the milli
    grid floor(p * 1000 + 0.5)."""
    root = _SM_ROOT.search(xml)
    if root is None:
        return "", []
    kind = "url" if root.group(1).lower() == "urlset" else "sitemap"
    out = []
    for m in _SM_BLOCK.finditer(xml):
        if m.group(1).lower() != kind:
            continue
        body = m.group(2)
        locm = _SM_FIELD["loc"].search(body)
        if locm is None:
            continue
        loc = _SM_WS.sub("", _sm_text(locm.group(1)))
        # a raw '<'/'>' cannot occur in a conforming loc (URLs must
        # be entity-escaped): it means an unclosed entry swallowed
        # following markup — reject the mangled entry rather than
        # emit a garbage URL
        if not loc or "<" in loc or ">" in loc:
            continue
        lastmod = None
        lm = _SM_FIELD["lastmod"].search(body)
        if lm is not None:
            lastmod = _sm_lastmod_us(_sm_text(lm.group(1)))
        prio = None
        pm = _SM_FIELD["priority"].search(body)
        if pm is not None:
            # strict decimal only: float() would also accept nan/inf
            # (which clamp to a VALID 0.0) and underscore literals
            ptext = _sm_text(pm.group(1))
            p = (float(ptext) if _SM_DECIMAL.match(ptext) else None)
            if p is not None:
                p = min(1.0, max(0.0, p))
                import math
                prio = int(math.floor(p * 1000 + 0.5))
        out.append({"loc": loc, "lastmod_us": lastmod,
                    "priority_milli": prio})
    return kind, out


def sitemap_urls(ds, xml_col: str = "xml", id_col: str = "doc_id"):
    """Sitemap ingestion — the crawl-seeding counterpart of
    :func:`robots_classify`: one row per <url>/<sitemap> entry across
    a corpus of fetched sitemap files.  Output (doc_id, rank, kind,
    loc, lastmod_us, priority_milli) with rank = document order;
    unrecognized roots and loc-less entries contribute nothing
    (predictable degradation on malformed fetches).  Absent or
    invalid lastmod/priority emit the sentinel ``-1`` (a valid
    sitemap cannot produce it: the protocol postdates the epoch and
    the priority grid is 0..1000) — plain int64 columns hash
    identically in both engines, where a nullable column's NA/NaN
    representation would not.

    Scale shape: a stateless vectorized flat map over compiled
    module-level patterns — no shuffle, no state, no XML DOM (and no
    DTD/entity expansion surface).  Nullable int64 fields stay on
    Arrow's nullable grid so empty/absent never collapses to a
    float NaN column."""
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids, ranks, kinds, locs, mods, prios = [], [], [], [], [], []
        for doc_id, xml in zip(batch[id_col].to_numpy(),
                               batch[xml_col].to_numpy()):
            kind, entries = sitemap_entries(
                xml if isinstance(xml, str) else "")
            for i, e in enumerate(entries):
                ids.append(int(doc_id))
                ranks.append(i)
                kinds.append(kind)
                locs.append(e["loc"])
                lm = e["lastmod_us"]
                mods.append(-1 if lm is None else lm)
                pr = e["priority_milli"]
                prios.append(-1 if pr is None else pr)
        return typed_if_empty(pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "rank": pd.Series(ranks, dtype="int64"),
            "kind": pd.Series(kinds, dtype="object"),
            "loc": pd.Series(locs, dtype="object"),
            "lastmod_us": pd.Series(mods, dtype="int64"),
            "priority_milli": pd.Series(prios, dtype="int64")}))

    return ds.map_batches(fn, batch_format="pandas")


# \ufeff: a UTF-8 BOM on the first line is common in real robots.txt
# and the REP draft says to skip it
_RS_LINE = re.compile(r"^[\t \ufeff]*sitemap[\t ]*:[\t ]*(\S+)",
                      re.IGNORECASE | re.MULTILINE)


def robots_sitemaps(ds, text_col: str = "robots_txt",
                    id_col: str = "doc_id"):
    """Sitemap discovery from robots.txt — the REP 'Sitemap:' field
    (google REP draft §2.3: case-insensitive key, full URL value,
    valid OUTSIDE any user-agent group, may repeat).  One row per
    directive in file order: (doc_id, rank, sitemap_url).  Trailing
    comments strip at the first '#'; values with raw whitespace end
    at it (\\S+ capture); blank values never emit.  Feeds
    :func:`sitemap_entries` for the crawl-seeding loop.

    Scale shape: stateless flat map over a compiled module-level
    pattern — no shuffle, no state."""
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids, ranks, urls = [], [], []
        for doc_id, txt in zip(batch[id_col].to_numpy(),
                               batch[text_col].to_numpy()):
            if not isinstance(txt, str):
                continue
            rank = 0
            for m in _RS_LINE.finditer(txt):
                url = m.group(1).split("#", 1)[0]
                if not url:
                    continue
                ids.append(int(doc_id))
                ranks.append(rank)
                urls.append(url)
                rank += 1
        return typed_if_empty(pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "rank": pd.Series(ranks, dtype="int64"),
            "sitemap_url": pd.Series(urls, dtype="object")}))

    return ds.map_batches(fn, batch_format="pandas")


def host_skew(ds, url_col: str = "url", num_parts: int = 64):
    """Crawl-skew report over a page corpus — the one-row diagnostic
    that sizes politeness budgets and shuffle salting BEFORE a crawl
    or host-keyed job runs: page counts per canonical host collapsed
    to a count-of-counts histogram, from which exact concentration
    statistics follow.  Output (one row): ``n_hosts``, ``n_pages``,
    ``max_count``, ``top_share_ppm`` (largest host's page share),
    ``top10_share_ppm``, ``gini_ppm`` (Gini of the host-size
    distribution, floor ppm).

    Gini is computed EXACTLY on integers from the histogram: with
    hosts sorted by size ascending, tied sizes contribute
    independently of their internal order, so for each distinct size
    ``v`` held by ``c`` hosts after ``r`` smaller hosts the rank-sum
    term is ``v * (2*(c*r + c*(c+1)//2) - (n+1)*c)``; gini_ppm =
    ``floor(10^6 * sum_terms / (n * total))`` — Python ints in the
    engine, HUGEINT in the SQL twin, identical floor points.

    Scale shape: per-batch canonical-host count partials -> ONE
    host-keyed coarse exchange (exact per-host counts) -> per-batch
    size-histogram partials -> ONE size-keyed exchange -> the final
    single group holds only the (size, n_hosts) histogram, whose
    cardinality is the number of DISTINCT host sizes — heavy-tailed
    corpora keep it thousands of rows at web scale, never
    host-count-sized."""
    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = canonicalize_urls(batch[[url_col]].rename(
            columns={url_col: "url"}), "url")
        g = (pd.DataFrame({"host": c["domain"]})
             .groupby("host", sort=False).size()
             .reset_index(name="n"))
        g = g[g["host"] != ""]
        g["n"] = g["n"].astype("int64")
        g["part"] = coarse_part(g["host"], num_parts)
        return typed_if_empty(g)

    def count_combine(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("host", sort=False)["n"].sum()
             .reset_index())
        g["n"] = g["n"].astype("int64")
        return typed_if_empty(g[["host", "n"]])

    counts = (ds.map_batches(count_partial, batch_format="pandas")
              .groupby("part").map_groups(count_combine,
                                          batch_format="pandas"))

    def hist_partial(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty or "n" not in batch.columns:
            return typed_if_empty(pd.DataFrame({
                "v": pd.Series([], dtype="int64"),
                "c": pd.Series([], dtype="int64"),
                "part": pd.Series([], dtype="int64")}))
        h = (batch.groupby("n", sort=False).size()
             .reset_index(name="c"))
        out = pd.DataFrame({"v": h["n"].astype("int64"),
                            "c": h["c"].astype("int64")})
        out["part"] = coarse_part(out["v"], num_parts)
        return typed_if_empty(out)

    def hist_combine(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("v", sort=False)["c"].sum()
             .reset_index())
        out = pd.DataFrame({"v": g["v"].astype("int64"),
                            "c": g["c"].astype("int64")})
        out["g"] = np.int64(0)
        return typed_if_empty(out)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        h = group.sort_values("v").reset_index(drop=True)
        n = int(h["c"].sum())
        total = int((h["v"] * h["c"]).sum())
        if n == 0 or total == 0:
            return pd.DataFrame({
                "n_hosts": [0], "n_pages": [0], "max_count": [0],
                "top_share_ppm": [0], "top10_share_ppm": [0],
                "gini_ppm": [0]})
        vmax = int(h["v"].iloc[-1])
        # top-10 pages from the histogram tail
        left, top10 = 10, 0
        for v, c in zip(reversed(h["v"].tolist()),
                        reversed(h["c"].tolist())):
            take = min(left, int(c))
            top10 += int(v) * take
            left -= take
            if left == 0:
                break
        num, r = 0, 0
        for v, c in zip(h["v"].tolist(), h["c"].tolist()):
            v, c = int(v), int(c)
            num += v * (2 * (c * r + c * (c + 1) // 2) - (n + 1) * c)
            r += c
        return pd.DataFrame({
            "n_hosts": pd.Series([n], dtype="int64"),
            "n_pages": pd.Series([total], dtype="int64"),
            "max_count": pd.Series([vmax], dtype="int64"),
            "top_share_ppm": pd.Series(
                [10 ** 6 * vmax // total], dtype="int64"),
            "top10_share_ppm": pd.Series(
                [10 ** 6 * top10 // total], dtype="int64"),
            "gini_ppm": pd.Series(
                [10 ** 6 * num // (n * total)], dtype="int64")})

    return (counts.map_batches(hist_partial, batch_format="pandas")
            .groupby("part").map_groups(hist_combine,
                                        batch_format="pandas")
            .groupby("g").map_groups(final, batch_format="pandas"))


def politeness_schedule(ds, delays: "pd.DataFrame | None" = None,
                        default_delay_ms: int = 1000,
                        n_lanes: int = 16, url_col: str = "url",
                        num_parts: int = 64):
    """Per-host politeness scheduling of a fetch list — the step
    between frontier construction (:func:`doc_ocr_ray.pipelines.
    frontier.crawl_frontier`) and the fetchers: every candidate URL
    gets a worker lane, an in-host slot and a fetch time offset such
    that (a) one host is only ever fetched from one lane (lane =
    md5 bucket of the domain, so no two workers hit a host
    concurrently) and (b) consecutive fetches of a host are spaced by
    its crawl delay (robots Crawl-delay, or ``default_delay_ms``).

    ``delays``: optional (domain, delay_ms) frame — robots-derived,
    domain-bounded by nature, broadcast inside the stage closure (the
    small-side rule; it never rides a shuffle).  In-host order is
    deterministic: canon_url ascending (the frontier already capped
    and ranked; a stable order is what politeness needs, not a
    priority).  Duplicate canonical URLs collapse (keep one fetch).

    ONE coarse domain-hash exchange; each partition ranks all its
    domains vectorized.  Output (domain, canon_url, lane, slot,
    fetch_offset_ms); lane/slot are 0- and 1-based respectively.
    """
    import hashlib

    delay_map = ({str(r["domain"]): int(r["delay_ms"])
                  for _, r in delays.iterrows()}
                 if delays is not None else {})

    def key(batch: pd.DataFrame) -> pd.DataFrame:
        c = canonicalize_urls(batch, url_col)
        out = c[["canon_url", "domain"]].drop_duplicates(["canon_url"])
        out["part"] = coarse_part(out["domain"], num_parts)
        return typed_if_empty(out)

    def schedule(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["canon_url"]).copy()
        g = g.sort_values(["domain", "canon_url"], kind="mergesort")
        g["slot"] = (g.groupby("domain", sort=False).cumcount()
                     + 1).astype("int64")
        doms = g["domain"].astype(str)
        lane_of = {d: int(hashlib.md5(f"lane:{d}".encode())
                          .hexdigest()[:8], 16) % n_lanes
                   for d in doms.unique()}
        g["lane"] = doms.map(lane_of).astype("int64")
        delay = doms.map(
            lambda d: delay_map.get(d, default_delay_ms)).astype("int64")
        g["fetch_offset_ms"] = ((g["slot"] - 1) * delay).astype("int64")
        return typed_if_empty(
            g[["domain", "canon_url", "lane", "slot",
               "fetch_offset_ms"]].reset_index(drop=True))

    return (ds.map_batches(key, batch_format="pandas")
            .groupby("part")
            .map_groups(schedule, batch_format="pandas"))


def domain_reputation(ds, url_col: str = "url",
                      pass_col: str = "passed",
                      num_parts: int = 64):
    """Per-domain quality reputation with a Wilson LOWER bound — the
    crawl-curation signal that a 3-doc domain with 3 passes must NOT
    outrank a 10,000-doc domain with 9,000 passes (a raw pass-rate
    sort does exactly that): the Wilson score interval's lower bound
    at z=2 shrinks toward 0 as evidence thins.

    All arithmetic is exact integers so the DuckDB twin matches bit
    for bit: with n docs and k passes,

        inner = (k*(n-k)*10^12) // n + 10^12
        s     = isqrt(inner)                  # 10^6-grid sqrt
        lb_ppm = max(0, ((k+2)*10^6 - 2*s) // (n + 4))

    (the z=2 Wilson LB scaled to parts-per-million; algebraically
    non-negative, the max(0,..) is a shared guard).  ``isqrt`` is
    Python's exact ``math.isqrt`` here and a double-sqrt seed
    corrected by +/-2 integer comparisons in SQL.  Python-int math
    (not numpy) because k*(n-k)*10^12 overflows int64 at web-scale
    domain sizes — the per-DOMAIN loop this costs is bounded by the
    partition's domain count, never its doc count.

    Input rows: (url, passed) with ``passed`` in {0,1} (the caller's
    quality gate — e.g. a gopher/c4 funnel verdict).  In-batch
    (domain, n, k) combiner, ONE coarse domain-hash exchange, Wilson
    math inside the group fn.  Output (domain, n_docs, n_pass,
    wilson_lb_ppm) sorted nowhere (consumers rank)."""
    import math

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = canonicalize_urls(batch, url_col)
        g = (c.groupby("domain", sort=False)[pass_col]
             .agg(["count", "sum"]).reset_index())
        out = pd.DataFrame({
            "domain": g["domain"].astype(object),
            "n": g["count"].astype("int64"),
            "k": g["sum"].astype("int64")})
        out["part"] = coarse_part(out["domain"], num_parts)
        return typed_if_empty(out)

    def wilson(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby("domain", sort=False)[["n", "k"]]
             .sum().reset_index())
        lbs = []
        for n, k in zip(g["n"], g["k"]):
            n, k = int(n), int(k)
            inner = (k * (n - k) * 10 ** 12) // n + 10 ** 12
            s = math.isqrt(inner)
            lbs.append(max(0, ((k + 2) * 10 ** 6 - 2 * s) // (n + 4)))
        return typed_if_empty(pd.DataFrame({
            "domain": g["domain"].astype(object),
            "n_docs": g["n"].astype("int64"),
            "n_pass": g["k"].astype("int64"),
            "wilson_lb_ppm": pd.Series(lbs, dtype="int64")}))

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("part")
            .map_groups(wilson, batch_format="pandas"))


# trailing class includes \r: robots.txt is CRLF on a large share of
# real servers and split("\n") leaves the \r on every line
_RD_KV = re.compile(r"^[\t ﻿]*([A-Za-z-]+)[\t ]*:[\t ]*(.*?)[\t\r ]*$")
_RD_NUM = re.compile(r"^(\d+)(?:\.(\d+))?$")


def robots_delays(ds, text_col: str = "robots_txt",
                  domain_col: str = "domain"):
    """Crawl-delay extraction from raw robots.txt — the parser that
    feeds :func:`politeness_schedule`'s per-domain delay table
    (Crawl-delay is non-standard but honoured by Bing/Yandex-class
    crawlers; a polite fetcher reads it).

    Group semantics per the Google REP parse model (the
    robots_classify scope): consecutive ``User-agent`` lines form a
    group header, any other directive line closes the header and
    starts the group's rule section, the next ``User-agent`` after
    rules starts a NEW group; blank lines are ignored; inline
    comments strip at ``#``.  The emitted delay is the FIRST valid
    ``Crawl-delay`` in any group whose header includes ``*``
    (deterministic under repeated/conflicting groups).  Values are
    strict decimal seconds (``\\d+(.\\d+)?`` after comment strip —
    anything else is ignored, the sitemap-priority discipline) and
    convert to ms by exact STRING math (int part * 1000 + first
    three fraction digits zero-padded; deeper digits floor away) —
    no float parse, so 0.1 s is exactly 100 ms.

    One row per document that yields a delay: (domain, delay_ms).
    Stateless flat map over compiled module-level patterns — no
    shuffle, no state."""
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        doms, delays = [], []
        for dom, txt in zip(batch[domain_col].to_numpy(),
                            batch[text_col].to_numpy()):
            if not isinstance(txt, str):
                continue
            in_header = False         # collecting User-agent lines
            star_group = False        # current group applies to '*'
            found = None
            for raw in txt.split("\n"):
                line = raw.split("#", 1)[0]
                m = _RD_KV.match(line)
                if not m:
                    continue          # blank / junk lines ignored
                key = m.group(1).lower()
                val = m.group(2)
                if key == "user-agent":
                    if not in_header:     # rules ended: NEW group
                        in_header = True
                        star_group = False
                    if val.strip("\t ") == "*":
                        star_group = True
                    continue
                in_header = False         # any rule closes the header
                if key == "crawl-delay" and star_group and found is None:
                    num = _RD_NUM.match(val)
                    # magnitude cap: the regex accepts unbounded digit
                    # strings, and an adversarial 10^20-second delay
                    # would overflow the int64 output column
                    # (OverflowError kills the task) — out-of-contract
                    # values are IGNORED, same as malformed ones.
                    # 10^8 s (~3 years) is already absurd politeness.
                    if num:
                        secs = num.group(1).lstrip("0") or "0"
                        if len(secs) <= 8:
                            frac = (num.group(2) or "")[:3].ljust(3, "0")
                            found = int(secs) * 1000 + int(frac)
            if found is not None:
                doms.append(dom)
                delays.append(found)
        return typed_if_empty(pd.DataFrame({
            "domain": pd.Series(doms, dtype="object"),
            "delay_ms": pd.Series(delays, dtype="int64")}))

    return ds.map_batches(fn, batch_format="pandas")


_UT_DIGITS = re.compile(r"[0-9]+")


def url_templates(ds, url_col: str = "url", k: int = 3,
                  num_parts: int = 64):
    """URL-template mining per domain — collapse digit runs in the
    PATH to ``#`` and count pages per resulting template.  The
    crawl-trap / faceted-navigation detector: a template like
    ``/item#/page#`` holding 10^7 of a host's 10^7 pages is a
    parameter explosion to cap, not content to fetch; templates also
    seed URL-pattern dedup rules (same-template pages are near-dup
    candidates before any text is fetched).

    Canonicalization first (lowercase/www/query-strip — query params
    vanish with the query, so only PATH digits generalize); the
    template of a path-less URL is ``/``.  Per domain the top-``k``
    templates by (page count DESC, template ASC) emit with an exact
    page-share in ppm: ``share_ppm = cnt * 10^6 // domain_pages``
    (domain totals computed inside the same group — no second
    exchange).

    Scale shape: per-batch (domain, template) count combiner, ONE
    coarse domain-hash exchange, all of a partition's domains ranked
    vectorized in its group fn.  Output (domain, template, cnt,
    share_ppm, tpl_rank)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = canonicalize_urls(batch, url_col)
        slash = c["canon_url"].str.find("/")
        path = pd.Series(
            [(u[i:] if i >= 0 else "/")
             for u, i in zip(c["canon_url"], slash)],
            index=c.index, dtype="object")
        tpl = path.str.replace(_UT_DIGITS, "#", regex=True)
        g = (pd.DataFrame({"domain": c["domain"], "template": tpl})
             .groupby(["domain", "template"], sort=False)
             .size().reset_index(name="cnt"))
        g = g[g["domain"] != ""]
        g["cnt"] = g["cnt"].astype("int64")
        g["part"] = coarse_part(g["domain"], num_parts)
        return typed_if_empty(g)

    def rank(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby(["domain", "template"], sort=False)["cnt"]
             .sum().reset_index())
        tot = g.groupby("domain", sort=False)["cnt"].transform("sum")
        g["share_ppm"] = (g["cnt"] * 10 ** 6 // tot).astype("int64")
        g = g.sort_values(["domain", "cnt", "template"],
                          ascending=[True, False, True],
                          kind="mergesort")
        g["tpl_rank"] = (g.groupby("domain", sort=False).cumcount()
                         + 1).astype("int64")
        g = g[g["tpl_rank"] <= k]
        return typed_if_empty(
            g[["domain", "template", "cnt", "share_ppm", "tpl_rank"]]
            .reset_index(drop=True))

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("part")
            .map_groups(rank, batch_format="pandas"))
