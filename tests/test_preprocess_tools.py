"""Offline preprocess extractor tests (L9): a synthetic danaLab raw tree
runs through the 4-modality SLP extractor and produces an npz index with
the reference schema (reference: datasets/preprocess/slp_depth.py:121-269)
that BaseDataset-style consumers can read."""

import json
import os
from os.path import join

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
sio = pytest.importorskip("scipy.io")

from inbed_pose_estimation_tpu.tools.preprocess.read_openpose import read_openpose
from inbed_pose_estimation_tpu.tools.preprocess.slp import (
    GLOBAL_IDX_17,
    slp_multi_mod,
)

N_IMGS = 2
COVERS = ("uncover", "cover1")


@pytest.fixture(scope="module")
def dana_tree(tmp_path_factory):
    """Minimal danaLab layout: 1 subject, N_IMGS frames, 2 covers."""
    root = tmp_path_factory.mktemp("slp_raw")
    dana = root / "danaLab"
    sub = dana / "00001"
    rng = np.random.default_rng(0)

    # joints_gt_RGB.mat: [3, 14, n] (x, y, occluded-flag).
    joints = np.zeros((3, 14, N_IMGS))
    joints[0] = rng.uniform(300, 700, (14, N_IMGS))  # x
    joints[1] = rng.uniform(200, 800, (14, N_IMGS))  # y
    joints[2] = 1.0  # visible
    joints[2, 3, :] = 0.0  # one occluded joint -> bed-depth fallback
    os.makedirs(sub)
    sio.savemat(join(str(sub), "joints_gt_RGB.mat"), {"joints_gt": joints})

    for mod, cover_list in (("RGB", COVERS), ("IR_aligned", COVERS),
                            ("depth_aligned", COVERS + ("uncover",)),
                            ("PM_aligned", COVERS)):
        for cover in set(cover_list):
            d = sub / mod / cover
            os.makedirs(d, exist_ok=True)
            for i in range(N_IMGS):
                img = rng.integers(0, 255, (64, 64), np.uint8)
                name = f"{i + 1:06d}.png"
                if mod == "RGB":
                    name = "image_" + name
                    img = np.stack([img] * 3, -1)
                cv2.imwrite(join(str(d), name), img)
    # A larger uncovered depth map so the pseudo-3D z lookup hits real
    # pixels at the joint coordinates.
    depth_unc = rng.integers(100, 200, (1024, 1024), np.uint8)
    for i in range(N_IMGS):
        cv2.imwrite(join(str(sub), "depth_aligned/uncover", f"{i + 1:06d}.png"), depth_unc)

    # One frame has an OpenPose detection, the other none.
    op_dir = sub / "openpose"
    os.makedirs(op_dir)
    kp = np.zeros((25, 3), np.float32)
    kp[:, 2] = 1.0
    kp[:, 0] = rng.uniform(300, 700, 25)
    kp[:, 1] = rng.uniform(200, 800, 25)
    with open(join(str(op_dir), "image_000001_keypoints.json"), "w") as f:
        json.dump({"people": [{"pose_keypoints_2d": kp.reshape(-1).tolist()}]}, f)

    np.savetxt(join(str(dana), os.pardir, "danaLab_data_gender.csv"),
               np.ones(200))
    return str(dana), depth_unc, joints


def test_slp_multi_mod_roundtrip(dana_tree, tmp_path):
    dana, depth_unc, joints = dana_tree
    out = str(tmp_path / "extras")
    slp_multi_mod(dana, out, "slp_4mod_test.npz", list(COVERS), [1],
                  imgs_per_cover=N_IMGS)

    data = np.load(join(out, "slp_4mod_test.npz"))
    n = len(COVERS) * N_IMGS
    assert sorted(data.files) == sorted([
        "imgname", "irimgname", "depthname", "pmname", "center", "scale",
        "part", "S", "openpose", "gender"])
    assert data["imgname"].shape == (n,)
    assert data["part"].shape == (n, 24, 3)
    assert data["S"].shape == (n, 24, 4)
    assert data["openpose"].shape == (n, 25, 3)

    # Filename conventions drive the dataset's cover1/cover2->uncover and
    # PM_aligned->masks rewriting — pin them.
    assert data["imgname"][0] == join("00001", "RGB/uncover", "image_000001.png")
    assert data["pmname"][-1] == join("00001", "PM_aligned/cover1", f"{N_IMGS:06d}.png")

    # bbox center/scale from the 14 GT joints x1.2/200
    # (slp_depth.py:160-166 semantics).
    p14 = joints[:2, :, 0].T
    want_center = [(p14[:, 0].min() + p14[:, 0].max()) / 2,
                   (p14[:, 1].min() + p14[:, 1].max()) / 2]
    np.testing.assert_allclose(data["center"][0], want_center, atol=1e-6)
    want_scale = 1.2 * max(np.ptp(p14[:, 0]), np.ptp(p14[:, 1])) / 200
    assert data["scale"][0] == pytest.approx(want_scale)

    # S24: 17 rows populated, joint GLOBAL_IDX_17[15] confidence zeroed,
    # z for the occluded joint = bed-depth fallback 178/255.
    S = data["S"][0]
    conf_rows = np.where(S[:, 3] > 0)[0]
    assert set(conf_rows) == set(GLOBAL_IDX_17) - {GLOBAL_IDX_17[15]}
    # z is inverted (1 - depth/255) and pelvis-centered, so assert the
    # centering-invariant DIFFERENCE: occluded joint 3 carries the
    # bed-depth fallback 178, visible joint 0 samples the uncovered depth
    # image at its pixel (slp_depth.py:176-188 semantics).
    y, x = int(p14[0, 1]), int(p14[0, 0])
    want_dz = (depth_unc[y, x] - 178.0) / 255.0
    assert (S[GLOBAL_IDX_17[3], 2] - S[GLOBAL_IDX_17[0], 2]
            ) == pytest.approx(want_dz, abs=1e-6)

    # OpenPose matched for frame 0, zeros where the json is absent.
    assert np.abs(data["openpose"][0]).max() > 0
    assert np.abs(data["openpose"][1]).max() == 0
    assert data["gender"][0] == 1


def test_read_openpose_picks_best_match(tmp_path):
    gt = np.zeros((24, 3))
    gt[:14, :2] = 100.0
    gt[:14, 2] = 1.0
    near = np.zeros((25, 3))
    near[:, :2], near[:, 2] = 101.0, 1.0
    far = np.zeros((25, 3))
    far[:, :2], far[:, 2] = 500.0, 1.0
    jf = str(tmp_path / "kp.json")
    with open(jf, "w") as f:
        json.dump({"people": [
            {"pose_keypoints_2d": far.reshape(-1).tolist()},
            {"pose_keypoints_2d": near.reshape(-1).tolist()},
        ]}, f)
    picked = read_openpose(jf, gt, "lsp")
    np.testing.assert_allclose(picked[:, :2], 101.0)
    assert read_openpose(str(tmp_path / "missing.json"), gt).sum() == 0
