"""CSV logger schema + host prefetch pipeline tests."""

import csv
import os
import time

import numpy as np
import pytest

from gpt2_vision_language_tpu.data.pipeline import HostPrefetcher
from gpt2_vision_language_tpu.obs.csvlog import MetricsLogger


def test_csv_schema_and_phases(tmp_path):
    log = MetricsLogger(str(tmp_path))
    log.train(1, 2.5, 1e-3, 0.9, 123.4, 5000.0)
    log.val(1, 2.4)
    log.hellaswag(1, 0.31, 31, 100)
    log.cider(1, 0.42)
    with open(log.csv_path) as f:
        rows = list(csv.reader(f))
    # exact reference schema (train_gpt2.py:303-305)
    assert rows[0] == [
        "time", "phase", "step", "loss", "lr", "grad_norm",
        "dt_ms", "tok_per_s", "hellaswag_acc",
    ]
    phases = [r[1] for r in rows[1:]]
    assert phases == ["train", "val", "hella", "cider"]
    assert rows[1][3] == "2.500000"
    assert rows[3][8] == "0.3100"
    # log.txt has the hella line (train_gpt2.py:420-421)
    assert "1 hella 0.3100" in open(log.txt_path).read()


def test_non_master_writes_nothing(tmp_path):
    log = MetricsLogger(str(tmp_path / "nm"), is_master=False)
    log.train(0, 1.0, 1e-3, 1.0, 1.0, 1.0)
    log.val(0, 1.0)
    assert not os.path.exists(str(tmp_path / "nm"))


def test_prefetcher_order_and_overlap():
    calls = []

    def produce():
        calls.append(len(calls))
        time.sleep(0.01)
        return len(calls) - 1

    pf = HostPrefetcher(produce, depth=2)
    got = [pf.next() for _ in range(5)]
    assert got == [0, 1, 2, 3, 4]
    pf.close()


def test_prefetcher_staging():
    pf = HostPrefetcher(lambda: np.ones(3), stage=lambda b: b * 2)
    np.testing.assert_array_equal(pf.next(), 2 * np.ones(3))
    pf.close()


def test_prefetcher_propagates_errors():
    state = {"n": 0}

    def produce():
        state["n"] += 1
        if state["n"] >= 2:
            raise ValueError("boom")
        return 1

    pf = HostPrefetcher(produce, depth=1)
    assert pf.next() == 1
    with pytest.raises(ValueError, match="boom"):
        for _ in range(3):
            pf.next()
    pf.close()


def test_xlsx_export_roundtrip(tmp_path):
    """Stdlib XLSX writer produces a zip openable as a spreadsheet."""
    import zipfile
    from xml.etree import ElementTree

    log = MetricsLogger(str(tmp_path))
    log.train(1, 2.5, 1e-3, 0.9, 123.4, 5000.0)
    log.val(1, 2.4)
    log.export_xlsx()
    xlsx = log.csv_path.replace(".csv", ".xlsx")
    assert os.path.exists(xlsx)
    with zipfile.ZipFile(xlsx) as z:
        names = set(z.namelist())
        assert "xl/worksheets/sheet1.xml" in names
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
        root = ElementTree.fromstring(sheet)  # valid XML
        assert "2.500000" in sheet and "train" in sheet
