"""Apps layer: history plotting parity, compat postprocess signature, CLI."""

import json
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture()
def fake_history(tmp_path):
    hist = [
        {"epoch": e, "train_loss": 1.0 / e, "val_loss": 1.2 / e,
         "val_dice": 1 - 1.0 / (e + 1), "val_iou": 1 - 1.5 / (e + 2),
         "lr": 5e-5 * (1 + np.cos(np.pi * e / 10)) / 2, "time": 8.5}
        for e in range(1, 11)
    ]
    # drop a key mid-run to exercise forward-fill (plot_history.py:47-61)
    del hist[4]["val_iou"]
    p = tmp_path / "run"
    p.mkdir()
    (p / "history.json").write_text(json.dumps(hist))
    return p, hist


def test_load_history_from_dir_and_file(fake_history):
    from vickers_tpu.utils.history import load_history

    p, hist = fake_history
    assert load_history(p)[0]["epoch"] == 1
    assert load_history(p / "history.json")[-1]["epoch"] == 10


def test_to_series_forward_fill(fake_history):
    from vickers_tpu.utils.history import to_series

    _, hist = fake_history
    s = to_series(hist)
    assert len(s["val_iou"]) == 10
    # forward-filled from epoch 4's value
    assert s["val_iou"][4] == s["val_iou"][3]


def test_moving_average():
    from vickers_tpu.utils.history import moving_average

    xs = [1.0, 2.0, 3.0, 4.0]
    assert moving_average(xs, 1) == xs
    ma = moving_average(xs, 2)
    assert ma == [1.0, 1.5, 2.5, 3.5]


def test_plot_and_csv(fake_history, tmp_path):
    from vickers_tpu.utils.history import load_history, plot_curves, save_csv

    p, _ = fake_history
    hist = load_history(p)
    out = tmp_path / "curves.png"
    plot_curves(hist, out, smooth=3)
    assert out.exists() and out.stat().st_size > 1000
    csv_out = tmp_path / "h.csv"
    save_csv(hist, csv_out)
    lines = csv_out.read_text().strip().splitlines()
    assert lines[0].split(",")[0] == "epoch"
    assert len(lines) == 11


def test_plot_history_cli(fake_history, capsys):
    from vickers_tpu.apps.plot_history import main

    p, _ = fake_history
    assert main([str(p)]) == 0
    assert (p / "curves.png").exists()


def test_compat_postprocess_signature(reference_masks):
    """The reference-signature wrapper returns (clean uint8, list of dicts)."""
    import cv2

    from vickers_tpu.apps.ui_infer_rectangle import postprocess_minarearect_multi

    name, m = reference_masks[0]
    prob = cv2.resize(m.astype(np.float32), (512, 341),
                      interpolation=cv2.INTER_LINEAR)
    img = np.zeros((341, 512, 3), np.uint8)
    clean, dets = postprocess_minarearect_multi(img, prob)
    assert clean.dtype == np.uint8 and set(np.unique(clean)) <= {0, 255}
    assert isinstance(dets, list) and dets
    d = dets[0]
    for k in ("label", "area", "box", "center", "d1", "d2", "d_mean"):
        assert k in d
    assert d["box"].dtype == np.int32 and d["box"].shape == (4, 2)
    # sorted by area desc
    areas = [x["area"] for x in dets]
    assert areas == sorted(areas, reverse=True)


def test_compat_letterbox_matches_reference_formula():
    import cv2

    from vickers_tpu.apps.ui_common import letterbox_square, unletterbox

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (300, 700, 3), np.uint8)
    sq, scale, pad = letterbox_square(img, 512)
    assert sq.shape == (512, 512, 3)
    assert scale == min(512 / 700, 1.0)
    prob = np.ones((512, 512), np.float32) * 0.3
    back = unletterbox(prob, scale, pad, (300, 700))
    assert back.shape == (300, 700)


def test_cli_devices(capsys):
    from vickers_tpu.apps.cli import main

    assert main(["devices"]) == 0
    out = capsys.readouterr().out
    assert "device_count" in out


def test_cli_infer_with_pth(tmp_path, capsys):
    import cv2
    import torch

    from vickers_tpu.apps.cli import main
    from vickers_tpu.compat.torch_ref import build_torch_model

    torch.manual_seed(0)
    torch.save(build_torch_model().state_dict(), tmp_path / "best.pth")
    img_p = tmp_path / "img.png"
    rng = np.random.default_rng(0)
    cv2.imwrite(str(img_p), rng.integers(0, 256, (96, 128, 3), np.uint8))
    rc = main(["infer", "--model-dir", str(tmp_path), "--img-size", "64",
               "--json", str(img_p)])
    assert rc == 0
    out = capsys.readouterr().out
    recs = json.loads(out.strip().splitlines()[-1])
    assert recs[0]["image"] == str(img_p)
    assert "detections" in recs[0]


def test_convergence_summary_on_reference_history():
    from pathlib import Path

    from vickers_tpu.utils.history import convergence_summary, load_history

    ref = Path("/root/reference/runs/unet_r34_512/history.json")
    if not ref.exists():
        pytest.skip("reference history unavailable")
    s = convergence_summary(load_history(ref))
    # the SURVEY §6 numbers
    assert abs(s["best_val_dice"] - 0.97291) < 1e-4
    assert s["best_epoch"] == 202
    assert abs(s["best_val_iou"] - 0.94765) < 1e-4
    assert abs(s["mean_epoch_time_s"] - 8.5) < 0.5


def test_cli_infer_batched(tmp_path, capsys):
    import cv2
    import torch

    from vickers_tpu.apps.cli import main
    from vickers_tpu.compat.torch_ref import build_torch_model

    torch.manual_seed(0)
    torch.save(build_torch_model().state_dict(), tmp_path / "best.pth")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = tmp_path / f"img{i}.png"
        cv2.imwrite(str(p), rng.integers(0, 256, (96, 128, 3), np.uint8))
        paths.append(str(p))
    rc = main(["infer", "--model-dir", str(tmp_path), "--img-size", "64",
               "--batched", "--json", *paths])
    assert rc == 0
    recs = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(recs) == 3
    assert all(r["image"] in paths for r in recs)


def test_cli_infer_batched_overflow_reroutes(tmp_path, capsys, monkeypatch):
    """The batched CLI must honor the PostprocessResult.overflow contract
    (infer/engine.py detect_batch docstring): a flagged image's geometry is
    replayed through the exact pixel labeler instead of silently emitting
    possibly-truncated detections (round-3 verdict weak #5)."""
    import cv2
    import jax.numpy as jnp
    import torch

    from vickers_tpu.apps.cli import main
    from vickers_tpu.compat.torch_ref import build_torch_model
    from vickers_tpu.infer.engine import InferenceEngine

    torch.manual_seed(0)
    torch.save(build_torch_model().state_dict(), tmp_path / "best.pth")
    p = tmp_path / "img.png"
    rng = np.random.default_rng(0)
    cv2.imwrite(str(p), rng.integers(0, 256, (64, 64, 3), np.uint8))

    # a prob map with one clean 30x40 blob: the exact labeler must find it
    prob = np.zeros((64, 64), np.float32)
    prob[10:40, 12:52] = 1.0

    class FakeRes:
        overflow = np.array([True])
        detections = None  # must never be touched for a flagged image

    def fake_detect_batch(self, imgs, quantized=False):
        return jnp.asarray(prob)[None], FakeRes()

    monkeypatch.setattr(InferenceEngine, "detect_batch", fake_detect_batch)
    rc = main(["infer", "--model-dir", str(tmp_path), "--img-size", "64",
               "--batched", "--json", str(p)])
    assert rc == 0
    cap = capsys.readouterr()
    assert "overflow" in cap.err
    recs = json.loads(cap.out.strip().splitlines()[-1])
    assert len(recs[0]["detections"]) == 1      # the blob survived the reroute
