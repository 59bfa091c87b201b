

def test_metrics_writer_roundtrip(tmp_path):
    """JSONL + TensorBoard scalar emission (reference SummaryWriter surface,
    scripts/train_diffusion.py:155-166)."""
    from shapemol_tpu.core.metrics import MetricsWriter, read_metrics
    d = str(tmp_path / "run")
    mw = MetricsWriter(d)
    mw.scalars({"loss": 1.5, "lr": 1e-3, "skipme": None}, step=10,
               prefix="train/")
    mw.scalar("val/loss", 2.0, step=20)
    mw.close()
    back = read_metrics(d)
    assert back["train/loss"] == [(10, 1.5)]
    assert back["val/loss"] == [(20, 2.0)]
    assert "train/skipme" not in back
