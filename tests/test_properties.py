"""Property-based tests (SURVEY.md §5/§7.4): the Column-expression rule
matcher vs an independent Python model of the reference's semantics
(written from kafka_s.py:240-285's description, not from the expression
code under test), over hypothesis-generated rules and titles."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_stream_spark.functions import rules

# alphabet that exercises separators, whitespace and CJK
_WORD = st.text(alphabet="ab词 快", min_size=0, max_size=4)


def model_match(title: str, in_rules: str, filter_rules: str) -> bool:
    """Reference semantics, independently: split on 、 → strip each
    OR-group → split on & (parts NOT re-stripped); match iff some group
    has all parts as substrings; veto iff any non-empty filter keyword
    (split on 、) is a substring."""
    groups = [g.strip().split("&") for g in in_rules.split("、")]
    included = any(all(kw in title for kw in grp) for grp in groups)
    vetoed = any(kw in title for kw in filter_rules.split("、") if kw != "")
    return included and vetoed is False


@st.composite
def _case(draw):
    title = draw(st.text(alphabet="ab词 快&、", min_size=0, max_size=20))
    n_groups = draw(st.integers(1, 3))
    groups = []
    for _ in range(n_groups):
        parts = draw(st.lists(_WORD, min_size=1, max_size=3))
        groups.append("&".join(parts))
    in_rules = "、".join(groups)
    filter_rules = "、".join(draw(st.lists(_WORD, min_size=0, max_size=2)))
    return title, in_rules, filter_rules


@settings(max_examples=12, deadline=None)
@given(st.lists(_case(), min_size=1, max_size=25))
def test_rule_match_agrees_with_model(spark, cases):
    df = spark.createDataFrame(cases, schema=["title", "in_rules", "filter_rules"])
    got = (
        df.select(
            "title",
            "in_rules",
            "filter_rules",
            rules.rule_matches(
                F.col("title"), F.col("in_rules"), F.col("filter_rules")
            ).alias("m"),
        )
        .collect()
    )
    for row in got:
        expected = model_match(row["title"], row["in_rules"], row["filter_rules"])
        assert row["m"] == expected, (
            row["title"],
            row["in_rules"],
            row["filter_rules"],
        )


def model_shingles(text: str, n: int = 3) -> list[str]:
    toks = [t for t in text.split(" ") if t]
    if len(toks) < n:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


@settings(max_examples=12, deadline=None)
@given(st.lists(st.text(alphabet="abc ", max_size=30), min_size=1, max_size=20))
def test_shingles_agree_with_model(spark, texts):
    from kafka_stream_spark.functions import text as T

    df = spark.createDataFrame([(t,) for t in texts], schema=["t"])
    got = df.select("t", T.shingles(T.tokens(F.col("t"))).alias("s")).collect()
    for row in got:
        assert row["s"] == model_shingles(row["t"]), repr(row["t"])


# ---------------------------------------------------------------------------
# codec round-trip properties (no Spark needed — pure Python codecs)
# ---------------------------------------------------------------------------


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    n_frames=st.integers(min_value=1, max_value=4),
    data=st.data(),
)
@settings(max_examples=30, deadline=None)
def test_avi_roundtrip_property(w, h, n_frames, data):
    """Any stack of arbitrary RGB frames survives the AVI container
    bit-for-bit — including odd widths that exercise DIB row padding."""
    from kafka_stream_spark.operators.multimodal import (
        decode_avi_frames,
        encode_avi,
    )

    frames = [
        bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=w * h * 3,
                    max_size=w * h * 3,
                )
            )
        )
        for _ in range(n_frames)
    ]
    rw, rh, out = decode_avi_frames(encode_avi(w, h, frames))
    assert (rw, rh) == (w, h)
    assert out == frames


@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=0,
        max_size=64,
    ),
)
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_property(rate, samples):
    """Any int16 sample vector survives the RIFF/PCM container."""
    from kafka_stream_spark.operators.multimodal import decode_wav, encode_wav

    r, ch, out = decode_wav(encode_wav(samples, sample_rate=rate))
    assert (r, ch) == (rate, 1)
    assert out == samples


@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    data=st.data(),
)
@settings(max_examples=30, deadline=None)
def test_bmp_roundtrip_property(w, h, data):
    """Any RGB image survives the BMP container (row padding incl.)."""
    from kafka_stream_spark.operators.multimodal import decode_bmp, encode_bmp

    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    rw, rh, out = decode_bmp(encode_bmp(w, h, rgb))
    assert (rw, rh, out) == (w, h, rgb)
