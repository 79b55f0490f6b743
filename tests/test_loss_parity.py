"""Golden parity of the loss assembly vs the reference formulas.

The reference trainer's losses (reference train/trainer.py:89-178) filter
valid rows with boolean indexing (`pred[has_smpl == 1]`) and reduce with
torch criterion means — dynamic shapes.  Our fixed-shape `where`-masked
versions (train/losses.py) must reproduce them exactly, including the
edge case of an empty valid set (the reference returns 0).  Each oracle
below re-derives the reference math in torch, with the citation it mirrors.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from inbed_pose_estimation_tpu.train import losses as L  # noqa: E402

B = 6


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(3)


def test_keypoint_loss_parity(rng):
    """Conf-weighted 2D reprojection MSE (reference trainer.py:89-98:
    conf[:, :25] *= openpose_weight, conf[:, 25:] *= gt_weight, then
    (conf * MSE_none(pred, gt)).mean() over ALL entries)."""
    pred = rng.normal(0, 1, (B, 49, 2)).astype(np.float32)
    gt = rng.normal(0, 1, (B, 49, 3)).astype(np.float32)
    gt[:, :, 2] = rng.uniform(0, 1, (B, 49))
    opw, gtw = 0.3, 1.0

    conf = torch.from_numpy(gt[:, :, -1:]).clone()
    conf[:, :25] *= opw
    conf[:, 25:] *= gtw
    mse = (torch.from_numpy(pred) - torch.from_numpy(gt[:, :, :2])) ** 2
    want = (conf * mse).mean().item()

    got = float(L.keypoint_loss(jnp.asarray(pred), jnp.asarray(gt), opw, gtw))
    assert got == pytest.approx(want, rel=1e-6)


def _ref_keypoint_3d(pred49, gt, has):
    """Reference trainer.py:100-117 verbatim semantics."""
    pred = torch.from_numpy(pred49)[:, 25:, :]
    conf = torch.from_numpy(gt[:, :, -1:]).clone()
    gt3 = torch.from_numpy(gt[:, :, :-1]).clone()
    hp = torch.from_numpy(has)
    gt3 = gt3[hp == 1]
    conf = conf[hp == 1]
    pred = pred[hp == 1]
    if len(gt3) > 0:
        gt_pelvis = (gt3[:, 2, :] + gt3[:, 3, :]) / 2
        gt3 = gt3 - gt_pelvis[:, None, :]
        pred_pelvis = (pred[:, 2, :] + pred[:, 3, :]) / 2
        pred = pred - pred_pelvis[:, None, :]
        return (conf * (pred - gt3) ** 2).mean().item()
    return 0.0


@pytest.mark.parametrize("valid", ["all", "half", "none"])
def test_keypoint_3d_loss_parity(rng, valid):
    pred49 = rng.normal(0, 1, (B, 49, 3)).astype(np.float32)
    gt = rng.normal(0, 1, (B, 24, 4)).astype(np.float32)
    gt[:, :, 3] = rng.uniform(0, 1, (B, 24))
    has = {"all": np.ones(B), "half": (np.arange(B) % 2).astype(float),
           "none": np.zeros(B)}[valid].astype(np.float32)

    want = _ref_keypoint_3d(pred49, gt, has)
    got = float(L.keypoint_3d_loss(jnp.asarray(pred49), jnp.asarray(gt), jnp.asarray(has)))
    assert got == pytest.approx(want, rel=2e-5, abs=1e-7)


@pytest.mark.parametrize("valid", ["all", "half", "none"])
def test_shape_loss_parity(rng, valid):
    """Per-vertex L1 over valid rows (reference trainer.py:158-165,
    criterion_shape = nn.L1Loss -> mean over the filtered set)."""
    pred = rng.normal(0, 1, (B, 200, 3)).astype(np.float32)
    gt = rng.normal(0, 1, (B, 200, 3)).astype(np.float32)
    has = {"all": np.ones(B), "half": (np.arange(B) % 2).astype(float),
           "none": np.zeros(B)}[valid].astype(np.float32)

    hp = torch.from_numpy(has)
    pv = torch.from_numpy(pred)[hp == 1]
    gv = torch.from_numpy(gt)[hp == 1]
    want = torch.nn.functional.l1_loss(pv, gv).item() if len(pv) else 0.0

    got = float(L.shape_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(has)))
    assert got == pytest.approx(want, rel=2e-6, abs=1e-8)


@pytest.mark.parametrize("valid", ["all", "half", "none"])
def test_smpl_losses_parity(rng, valid):
    """Rotmat/betas MSE over valid rows (reference trainer.py:167-178; gt
    rotmats via batch_rodrigues of the 72-dim axis-angle — rodrigues parity
    itself is pinned separately in test_geometry, so the oracle reuses our
    implementation and this test isolates the masking/reduction semantics)."""
    from inbed_pose_estimation_tpu.geometry import batch_rodrigues

    def ref_rodrigues(aa):
        return torch.from_numpy(
            np.asarray(batch_rodrigues(jnp.asarray(aa.numpy()))))

    pose = rng.normal(0, 0.4, (B, 72)).astype(np.float32)
    pred_rot = rng.normal(0, 1, (B, 24, 3, 3)).astype(np.float32)
    pred_betas = rng.normal(0, 1, (B, 10)).astype(np.float32)
    gt_betas = rng.normal(0, 1, (B, 10)).astype(np.float32)
    has = {"all": np.ones(B), "half": (np.arange(B) % 2).astype(float),
           "none": np.zeros(B)}[valid].astype(np.float32)

    hp = torch.from_numpy(has)
    gt_rot = ref_rodrigues(torch.from_numpy(pose).view(-1, 3)).view(-1, 24, 3, 3)
    prv, grv = torch.from_numpy(pred_rot)[hp == 1], gt_rot[hp == 1]
    pbv, gbv = torch.from_numpy(pred_betas)[hp == 1], torch.from_numpy(gt_betas)[hp == 1]
    if len(prv):
        want_pose = torch.nn.functional.mse_loss(prv, grv).item()
        want_betas = torch.nn.functional.mse_loss(pbv, gbv).item()
    else:
        want_pose = want_betas = 0.0

    got_pose, got_betas = L.smpl_losses(
        jnp.asarray(pred_rot), jnp.asarray(pred_betas),
        jnp.asarray(pose), jnp.asarray(gt_betas), jnp.asarray(has))
    assert float(got_pose) == pytest.approx(want_pose, rel=2e-5, abs=1e-7)
    assert float(got_betas) == pytest.approx(want_betas, rel=2e-5, abs=1e-7)


def test_recon_and_camera_parity(rng):
    """Masked recovery L1 keeps the reference's mean-over-ALL-pixels
    normalization (trainer.py:143-148), and the positive-depth camera term
    is ((exp(-10 s))^2).mean() (trainer.py:1006)."""
    pred = rng.normal(0, 1, (B, 16, 16, 1)).astype(np.float32)
    gt = rng.normal(0, 1, (B, 16, 16, 1)).astype(np.float32)
    mask = (rng.uniform(0, 1, (B, 16, 16, 1)) > 0.5).astype(np.float32)

    want = torch.nn.functional.l1_loss(
        torch.from_numpy(pred * mask), torch.from_numpy(gt * mask)).item()
    got = float(L.recon_l1_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    assert got == pytest.approx(want, rel=2e-6)

    cam = rng.normal(0.8, 0.3, (B, 3)).astype(np.float32)
    want_cam = ((torch.exp(-torch.from_numpy(cam)[:, 0] * 10)) ** 2).mean().item()
    got_cam = float(L.camera_scale_regularizer(jnp.asarray(cam)))
    assert got_cam == pytest.approx(want_cam, rel=1e-5)
