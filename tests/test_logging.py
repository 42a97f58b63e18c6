"""MetricsLogger JSONL output."""

import json

from matcha_tpu.train.logging import MetricsLogger


def test_jsonl_written(tmp_path):
    mlog = MetricsLogger(str(tmp_path))
    train = {"bce": 0.5, "recon": 1.0, "hyperedges_per_sec": 1234.0,
             "metrics": {"all": {"auroc": 0.9, "auprc": 0.8, "acc": 0.7}}}
    valid = {"bce": 0.6, "recon": 1.1,
             "metrics": {"all": {"auroc": 0.85, "auprc": 0.75, "acc": 0.65}}}
    mlog.log_epoch("stage2", 0, train, valid)
    mlog.log_epoch("stage2", 1, train, valid)
    mlog.close()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["stage"] == "stage2"
    assert rec["train_bce"] == 0.5
    assert rec["valid_metrics"]["all"]["auroc"] == 0.85


def test_stdout_passthrough(tmp_path):
    msgs = []
    mlog = MetricsLogger(None, stdout=msgs.append)
    mlog("hello")
    assert msgs == ["hello"]
    mlog.log_epoch("s", 0, {"bce": 1, "recon": 1, "metrics": {}},
                   {"bce": 1, "recon": 1, "metrics": {}})  # no file: no-op
    mlog.close()
