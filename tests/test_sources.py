"""Tests for the file-source surface (S6/S7) with reference-shaped fixtures
written on the fly (dirty rows, embedded headers, positional labels)."""

from __future__ import annotations

import json
import shutil
import tempfile
from pathlib import Path

from insight_de_smart_grid_spark.sources import files as fs


def test_read_redd_channels_recovers_house_and_channel(spark):
    root = Path(tempfile.mkdtemp(prefix="redd_"))
    try:
        d = root / "house_3"
        d.mkdir()
        (d / "channel_1.dat").write_text("1303132929 222.3\n1303132932 221.9\n")
        (d / "channel_2.dat").write_text("1303132929 4.0\nnotanumber bad\n")
        out = fs.read_redd_channels(spark, str(root / "*" / "*.dat"))
        rows = {(r.house_id, r.channel_idx, r.power) for r in out.collect()}
        assert ("3", 1, 222.3) in rows and ("3", 1, 221.9) in rows
        assert ("3", 2, 4.0) in rows
        # dirty row coerced to 0.0 with epoch 0 ts (producer parity)
        assert ("3", 2, 0.0) in rows
        assert out.count() == 4
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_read_greend_skips_embedded_headers_and_coerces(spark):
    root = Path(tempfile.mkdtemp(prefix="greend_"))
    try:
        d = root / "building0"
        d.mkdir()
        (d / "dataset_2014.csv").write_text(
            "timestamp,c0,c1,c2,c3,c4,c5,c6,c7,c8\n"
            "1388530800,1.5,2.5,,bad,5.0,6,7,8,9\n"
            "timestamp,c0,c1,c2,c3,c4,c5,c6,c7,c8\n"  # embedded header
            "1388530801,10,20,30,40,50,60,70,80,90\n")
        out = fs.read_greend_csv(spark, str(root / "*" / "*.csv"))
        rows = out.collect()
        # 2 data rows x 9 channels; the embedded header row is dropped
        assert len(rows) == 18
        by_key = {(r.ts.isoformat(), r.channel_idx): r.power for r in rows}
        assert by_key[("2013-12-31T23:00:00", 0)] == 1.5
        assert by_key[("2013-12-31T23:00:00", 2)] == 0.0  # empty -> 0.0
        assert by_key[("2013-12-31T23:00:00", 3)] == 0.0  # 'bad' -> 0.0
        assert by_key[("2013-12-31T23:00:01", 8)] == 90.0
        assert rows[0].building == "building0"
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_read_labels_json_positional_dim(spark):
    root = Path(tempfile.mkdtemp(prefix="labels_"))
    try:
        p = root / "labels.json"
        p.write_text(json.dumps({
            "0": ["fridge", "dishwasher", "kettle"],
            "1": ["tv", "radio"],
        }))
        dim = fs.read_labels_json(spark, str(p))
        rows = {(r.house_id, r.channel_idx, r.appliance_name)
                for r in dim.collect()}
        assert rows == {("0", 0, "fridge"), ("0", 1, "dishwasher"),
                        ("0", 2, "kettle"), ("1", 0, "tv"), ("1", 1, "radio")}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_avro_gate_reports_availability(spark):
    # spark-avro jar is not part of the base pyspark install; whichever way
    # this environment is set up, the gate must answer without raising
    assert fs.avro_available(spark) in (True, False)
