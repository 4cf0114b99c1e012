"""Property-based parity: the wire ETL chain vs a pure-Python
re-implementation of the reference DoFn (`ParsePubSubMessage`,
Streamingdag.py:159-236) — the SURVEY.md §7 watch-list items (Python
string truthiness, 'unknown' sentinel, bare-except hour fallback,
value default) checked over randomized events, not just canned cases.

Documented boundary (operators/transforms.validate_required): a required
key explicitly present with JSON null is treated as missing (dropped);
the generator therefore never emits explicit nulls. Likewise an explicit
null `value` would crash the reference's float() into its catch-all drop
— absent models both engines' common domain.
"""

from __future__ import annotations

import json
from datetime import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_DIR  # noqa: F401  (spark fixture import chain)

REQUIRED = ["id", "timestamp", "message", "user_id", "event_type"]

_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126, exclude_characters='"\\'),
    max_size=12,
)
_user = st.one_of(_text, st.just("unknown"), st.just(""))
_ts = st.one_of(
    st.just("2024-01-05T10:30:00Z"),
    st.just("2024-01-05T23:59:59.123456Z"),
    st.just("2024-01-05 07:15:00"),
    st.just("2024-01-05T10:30:00+05:30"),
    st.just("2024-01-05T10:30:00-08:00"),
    st.just(""),
    st.just("not-a-timestamp"),
    st.just("2024-13-45T99:99:99Z"),
    _text,
)
_value = st.one_of(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    st.integers(min_value=-1000, max_value=1000),
)

_event = st.fixed_dictionaries(
    {},
    optional={
        "id": _text,
        "timestamp": _ts,
        "message": _text,
        "user_id": _user,
        "event_type": _text,
        "value": _value,
        "source": _text,  # optional pass-through
        "zzz_unknown_key": _text,  # must be dropped (T9)
    },
)


def _ref_model(data: dict):
    """The reference DoFn, re-implemented verbatim in Python."""
    if any(k not in data for k in REQUIRED):
        return None
    rec = {k: str(data[k]) for k in REQUIRED}
    try:
        value = float(data.get("value", 0.0))
    except Exception:
        return None  # catch-all drop (T4)
    message_length = len(rec["message"]) if rec["message"] else 0
    try:
        event_hour = datetime.fromisoformat(
            rec["timestamp"].replace("Z", "+00:00")
        ).hour
    except Exception:
        event_hour = 0
    score = 0
    if rec["user_id"] and rec["user_id"] != "unknown":
        score += 25
    if rec["message"]:
        score += 25
    if value > 0:
        score += 25
    if rec["timestamp"]:
        score += 25
    if score < 50:
        return None
    return (
        rec["id"],
        message_length,
        event_hour,
        score,
        value,
    )


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(_event, min_size=1, max_size=8))
def test_wire_pipeline_matches_reference_dofn(_spark, events):
    from streaming_data_pipeline_spark.operators.transforms import wire_pipeline

    # unique id per row so results can be matched up
    for i, ev in enumerate(events):
        ev["id"] = f"{i}:{ev.get('id', '')}" if "id" in ev else ev.get("id")
        if ev["id"] is None:
            del ev["id"]
    wire = _spark.createDataFrame(
        [(json.dumps(ev),) for ev in events], "value string"
    )
    out = wire_pipeline(wire, as_of="2024-01-31 00:00:00").select(
        "id", "message_length", "event_hour", "data_quality_score", "value"
    )
    got = {
        r.id: (r.message_length, r.event_hour, r.data_quality_score, r.value)
        for r in out.collect()
    }
    want = {}
    for ev in events:
        res = _ref_model(ev)
        if res is not None:
            rid, ml, eh, score, value = res
            want[rid] = (ml, eh, score, value)
    assert got == want
