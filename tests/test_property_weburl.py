"""Property differential for weburl.registrable_domain: Hypothesis
assembles hosts from random labels and known/unknown suffixes; the
Spark expression must equal an independent pure-Python longest-suffix
PSL match on every host.  (The expression's fall-through semantics —
a host that IS a suffix must NOT resolve via a shorter suffix — broke
once during development; this pins it for good.)"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pandera_spark.operators.weburl import (
    DEFAULT_SUFFIXES,
    registrable_domain,
)

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

label = st.text(
    alphabet="abcxyz019-", min_size=1, max_size=6
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))

host_parts = st.tuples(
    st.lists(label, min_size=0, max_size=3),        # leading labels
    st.one_of(                                       # tail
        st.sampled_from(list(DEFAULT_SUFFIXES)),     # a known suffix
        label,                                       # unknown TLD
        st.builds(lambda a, b: f"{a}.{b}", label, label),  # unknown 2-label
    ),
)


def py_registrable(host: str, suffixes=DEFAULT_SUFFIXES) -> "str | None":
    """Independent reference: longest matching public suffix; domain =
    suffix + one label; host == suffix (or nothing left of it) -> None;
    no suffix match -> last two labels; single label -> None."""
    labels = host.split(".")
    best = None
    for s in suffixes:
        sl = s.lower().split(".")
        if len(sl) <= len(labels) and labels[-len(sl):] == sl:
            if best is None or len(sl) > len(best):
                best = sl
    if best is not None:
        if len(labels) > len(best):
            return ".".join(labels[-(len(best) + 1):])
        return None
    if len(labels) >= 2:
        return ".".join(labels[-2:])
    return None


class TestRegistrableDomainProperty:
    @SET
    @given(parts=st.lists(host_parts, min_size=1, max_size=8))
    def test_matches_python_reference(self, spark, parts):
        hosts = [
            ".".join([*lead, tail]) for lead, tail in parts
        ]
        df = spark.createDataFrame([(h,) for h in hosts], "host string")
        out = df.select(
            "host", registrable_domain(F.col("host")).alias("dom")
        ).collect()
        for r in out:
            assert r["dom"] == py_registrable(r["host"]), r["host"]

    def test_known_tricky_cases(self, spark):
        cases = {
            "co.uk": None,            # bare 2-label suffix
            "uk": None,               # bare 1-label suffix
            "x.co.uk": "x.co.uk",
            "a.b.x.co.uk": "x.co.uk",
            "com.au": None,           # 2-label suffix, also "au" known
            "x.com.au": "x.com.au",
            "weird": None,            # single unknown label
            "a.weird": "a.weird",     # unknown TLD fallback
            "b.a.weird": "a.weird",
            "gov.uk.com": "uk.com",   # suffix-looking labels mid-host:
                                      # tail match is "com"
        }
        df = spark.createDataFrame(
            [(h,) for h in cases], "host string"
        )
        got = {
            r["host"]: r["dom"]
            for r in df.select(
                "host", registrable_domain(F.col("host")).alias("dom")
            ).collect()
        }
        for h, want in cases.items():
            assert got[h] == want, (h, got[h], want)
            assert py_registrable(h) == want, h


# ---------------------------------------------------------------------------
# url_content_filter differential (r11): Hypothesis assembles URLs from
# segment/extension/param components; the Spark expression's fired rule
# must equal an independent pure-Python classification of the same URL.

from pandera_spark.operators.weburl import (  # noqa: E402
    NONCONTENT_EXTENSIONS,
    NONCONTENT_PATH_PATTERNS,
    TRACKING_PARAMS,
    url_content_filter,
)

seg = st.one_of(
    st.sampled_from(["article", "post", "x1", "about",
                     "tagging-guide", "feed2"]),   # content-safe
    st.sampled_from(list(NONCONTENT_PATH_PATTERNS[:12])),
)
extension = st.one_of(
    st.none(),
    st.sampled_from(list(NONCONTENT_EXTENSIONS[:10])),
    st.sampled_from(["html", "htm", "php"]),       # content extensions
)
param = st.one_of(
    st.sampled_from(["q=1", "id=2", "ref=x"]),
    st.sampled_from([f"{t}=x" for t in TRACKING_PARAMS[:4]]),
)
url_parts = st.tuples(
    st.lists(seg, min_size=0, max_size=10),
    extension,
    st.lists(param, min_size=0, max_size=10),
)


def py_classify(segs, ext, params, max_params=8, max_depth=8):
    """Independent reference of url_content_filter's rule order."""
    all_segs = list(segs) + (
        [f"leaf.{ext}"] if ext is not None else []
    )
    if any(s in NONCONTENT_PATH_PATTERNS for s in all_segs):
        return "path_pattern"
    if all_segs:
        last = all_segs[-1]
        if "." in last and last.rsplit(".", 1)[1] in NONCONTENT_EXTENSIONS:
            return "extension"
    if params and (
        len(params) > max_params
        or any(p.split("=", 1)[0] in TRACKING_PARAMS for p in params)
    ):
        return "params"
    if len(all_segs) > max_depth:
        return "path_depth"
    return None


class TestUrlContentFilterProperty:
    @SET
    @given(parts=url_parts)
    def test_matches_python_reference(self, spark, parts):
        segs, ext, params = parts
        path = "/" + "/".join(
            list(segs) + ([f"leaf.{ext}"] if ext is not None else [])
        )
        q = ("?" + "&".join(params)) if params else ""
        url = f"https://ex.com{path}{q}"
        df = spark.createDataFrame([(url,)], "url string")
        r = url_content_filter(df, "url", flag_out="drop").first()
        assert r.drop_rule == py_classify(segs, ext, params), url
