"""Adversarial-bytes round-trip fidelity for the non-parquet source formats.

The driver can regenerate testdata between rounds; if corpus text ever
contains hostile bytes (control chars, bare CR, CRLF, whitespace-only
fields, quotes/backslashes at field edges, NFC-vs-NFD unicode, 4-byte
emoji), the JSON/CSV/XML round-trip operators must still preserve them
byte-exactly — or fail loudly, never silently corrupt. These tests drive
the SAME option sets the operators use (csv_write_fidelity /
csv_read_fidelity and the operators' inline JSON/XML configs).

Measured format limits (probed, not assumed):
- JSON lines: lossless for every case below including NUL and control
  chars (escaped as \\uXXXX).
- CSV: lossless with the fidelity option set; NULL vs empty-string needs
  the \\N sentinel; without multiLine the FAILFAST read ABORTS on embedded
  newlines (the pre-round-5 config would have).
- XML 1.0: control characters are ILLEGAL by spec — the writer raises
  (loud, not lossy); whitespace-only element text is trimmed to '' by the
  parser. Everything else round-trips, including bare CR and CRLF.
"""

import shutil

import pytest

from spark_sql_flow_plugin_spark.operators.misc import (
    csv_read_fidelity,
    csv_write_fidelity,
)

ADVERSARIAL = {
    "plain": "hello world",
    "empty": "",
    "ws_only": "   ",
    "tab": "a\tb",
    "lf": "line1\nline2",
    "crlf": "line1\r\nline2",
    "bare_cr": "a\rb",
    "quote_edges": '"quoted" and ""double"" end"',
    "backslash_edges": "\\tail\\",
    "comma": "a,b,c",
    "nfc": "café",
    "nfd": "café",
    "emoji_4byte": "\U0001f600\U0001f3fd test",
    "xml_entities": "&amp; <tag> 'q' \"qq\"",
    "angle_amp": "a <b> & c > d",
}
CONTROL = {
    "ctrl": "a\x01b\x1fc",
    "nul": "a\x00b",
}

SCHEMA = "id bigint, k string, v string"


def _df(spark, cases):
    rows = [(i, k, v) for i, (k, v) in enumerate(sorted(cases.items()))]
    rows.append((999, "real_null", None))
    return spark.createDataFrame(rows, SCHEMA)


def _assert_roundtrip(back, cases):
    got = {r.k: r.v for r in back.collect()}
    expect = dict(cases)
    expect["real_null"] = None
    diffs = {k: (got.get(k, "<missing>"), v) for k, v in expect.items()
             if got.get(k, "<missing>") != v}
    assert not diffs, f"bytes did not survive the round-trip: {diffs}"


def test_json_roundtrip_is_fully_lossless(spark, tmp_path):
    cases = {**ADVERSARIAL, **CONTROL}
    path = str(tmp_path / "json")
    _df(spark, cases).write.mode("overwrite").option(
        "compression", "gzip"
    ).json(path)
    back = spark.read.schema(SCHEMA).json(path)
    _assert_roundtrip(back, cases)


def test_csv_fidelity_options_preserve_adversarial_bytes(spark, tmp_path):
    cases = {**ADVERSARIAL, **CONTROL}
    path = str(tmp_path / "csv")
    csv_write_fidelity(_df(spark, cases).write.mode("overwrite")).csv(path)
    back = csv_read_fidelity(spark.read.schema(SCHEMA)).csv(path)
    _assert_roundtrip(back, cases)


def test_csv_without_multiline_aborts_loudly_on_embedded_newlines(
    spark, tmp_path
):
    # regression guard for the pre-round-5 config: a FAILFAST read without
    # multiLine must ERROR on embedded newlines, not silently mangle rows
    path = str(tmp_path / "csv_nomulti")
    csv_write_fidelity(
        _df(spark, {"lf": "line1\nline2"}).write.mode("overwrite")
    ).csv(path)
    bad = (
        spark.read.schema(SCHEMA)
        .option("header", True)
        .option("escape", '"')
        .option("mode", "FAILFAST")
        .csv(path)
    )
    with pytest.raises(Exception):
        bad.collect()


def test_xml_roundtrip_lossless_within_spec(spark, tmp_path):
    # whitespace-only element text is trimmed by the XML parser (spec
    # behavior); everything else must survive, including CR / CRLF
    cases = {k: v for k, v in ADVERSARIAL.items() if k != "ws_only"}
    path = str(tmp_path / "xml")
    (
        _df(spark, cases)
        .write.mode("overwrite")
        .format("xml")
        .option("rootTag", "docs")
        .option("rowTag", "doc")
        .save(path)
    )
    back = (
        spark.read.schema(SCHEMA).format("xml").option("rowTag", "doc").load(path)
    )
    _assert_roundtrip(back, cases)


def test_xml_rejects_control_chars_loudly(spark, tmp_path):
    # XML 1.0 forbids control characters: the writer must raise, never
    # silently strip or substitute
    path = str(tmp_path / "xml_ctrl")
    shutil.rmtree(path, ignore_errors=True)
    with pytest.raises(Exception):
        (
            _df(spark, CONTROL)
            .write.mode("overwrite")
            .format("xml")
            .option("rootTag", "docs")
            .option("rowTag", "doc")
            .save(path)
        )


def test_orc_roundtrip_is_fully_lossless(spark, tmp_path):
    # ORC strings are length-prefixed binary: every adversarial case —
    # including the control chars XML must reject — must survive verbatim
    cases = {**ADVERSARIAL, **CONTROL}
    path = str(tmp_path / "orc")
    _df(spark, cases).write.mode("overwrite").option(
        "compression", "zlib"
    ).orc(path)
    back = spark.read.schema(SCHEMA).orc(path)
    _assert_roundtrip(back, cases)
