"""Real-XML-parser tests: ElementTree parse, genuine ParseError fallback,
error rows, and branch counts on a known id range."""

import pyarrow as pa
import pytest

from librecatastro_ray.pipelines.parse import (
    XmlRecordParser,
    synth_xml,
)


def test_good_payload_parses_all_entries():
    t = pa.table({"doc_id": pa.array([3], pa.int64()),
                  "xml": pa.array([synth_xml(3)], pa.binary())})
    rows = XmlRecordParser()(t).to_pylist()
    assert len(rows) == 1 + 3 % 5  # n_entries
    assert all(r["via"] == "xml" for r in rows)
    assert rows[0]["entry_key"] == f"k{(3 * 7) % 20}"
    assert rows[0]["entry_val"] == (3 * 31) % 1000


def test_truncated_payload_really_fails_and_recovers():
    import xml.etree.ElementTree as ET

    buf = synth_xml(74)  # 74 % 37 == 0, n = 1 + 74 % 5 = 5 → recover 2
    with pytest.raises(ET.ParseError):
        ET.fromstring(buf)  # the malformation is real, not simulated
    t = pa.table({"doc_id": pa.array([74], pa.int64()),
                  "xml": pa.array([buf], pa.binary())})
    rows = XmlRecordParser()(t).to_pylist()
    assert len(rows) == 5 // 2
    assert all(r["via"] == "fallback" for r in rows)
    assert rows[0]["entry_val"] == (74 * 31) % 1000


def test_unrecoverable_payload_emits_error_row():
    buf = synth_xml(0)  # n = 1 → 1 // 2 = 0 entries survive truncation
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "xml": pa.array([buf], pa.binary())})
    rows = XmlRecordParser()(t).to_pylist()
    assert rows == [{"doc_id": 0, "entry_key": "", "entry_val": 0, "via": "error"}]


def test_pipeline_branch_counts(ray_session):
    from librecatastro_ray.pipelines.parse import parse_xml_records

    df = parse_xml_records("/root/testdata/sf0.001").to_pandas()
    vias = df["via"].value_counts().to_dict()
    assert vias.get("xml", 0) > 0 and vias.get("fallback", 0) > 0
    assert vias.get("error", 0) >= 1  # doc 0 and the 37k/5-aligned ids
    # every doc appears
    assert df["doc_id"].nunique() == 500


def test_empty_but_valid_payload_emits_row():
    t = pa.table({"doc_id": pa.array([9], pa.int64()),
                  "xml": pa.array([b'<doc id="9"></doc>'], pa.binary())})
    rows = XmlRecordParser()(t).to_pylist()
    assert rows == [{"doc_id": 9, "entry_key": "", "entry_val": 0, "via": "empty"}]
