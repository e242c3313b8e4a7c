"""Property-based frame codec tests (hypothesis): encode/parse roundtrip for
arbitrary table names (including pipes/backslashes) and payload content —
the generalization of the reference's hand-picked escape cases."""

from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_spark.loggen import to_frames
from cdc_spark.parse import parse_frames

# printable-ish text including the escape-sensitive characters
tables = st.text(
    alphabet=st.sampled_from(list("abz|\\_0") + ["|", "\\"]), min_size=0, max_size=12
)
texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=40,
)


@settings(max_examples=12, deadline=None)
@given(table=tables, content=texts, repo=texts)
def test_frame_roundtrip(spark, table, content, repo):
    env = spark.createDataFrame(
        [(1, "update", table, repo, "p", "c", "py", content, None, None)],
        "lsn BIGINT, op STRING, `table` STRING, repo STRING, path STRING, "
        "`commit` STRING, lang STRING, content STRING, "
        "extra MAP<STRING,STRING>, schema_change STRING",
    )
    back = parse_frames(to_frames(env)).collect()[0]
    assert back["op"] == "update"
    assert back["table"] == table
    assert back["repo"] == repo
    assert back["content"] == content
    assert back["lsn"] == 1
