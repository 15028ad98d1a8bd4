"""InceptionV3-pool3 (canonical FID features): importer layout, BN folding
vs torch eval-mode, and end-to-end FID sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
from flax import traverse_util

from flash_diffusion_tpu.eval.metrics import fid_from_features
from flash_diffusion_tpu.models.inception import (
    BasicConv,
    InceptionV3Pool3,
    import_inception_v3,
    preprocess,
)


def test_basicconv_matches_torch_conv_bn_eval():
    """Folded scale/bias == torch Conv2d + BatchNorm2d(eval, eps=1e-3)."""
    torch.manual_seed(0)
    conv = tnn.Conv2d(3, 8, 3, stride=2, bias=False)
    bn = tnn.BatchNorm2d(8, eps=1e-3)
    bn.weight.data.normal_()
    bn.bias.data.normal_()
    bn.running_mean.normal_()
    bn.running_var.uniform_(0.5, 2.0)
    bn.eval()

    x = torch.randn(2, 3, 11, 11)
    ref = torch.relu(bn(conv(x))).detach().numpy()

    sd = {
        "M.conv.weight": conv.weight.detach().numpy(),
        "M.bn.weight": bn.weight.detach().numpy(),
        "M.bn.bias": bn.bias.detach().numpy(),
        "M.bn.running_mean": bn.running_mean.numpy(),
        "M.bn.running_var": bn.running_var.numpy(),
    }
    params = import_inception_v3(sd)["params"]["M"]
    mod = BasicConv(8, (3, 3), stride=2, padding=0)
    out = mod.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.array(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
    )


def _synthetic_torchvision_sd(rng):
    """Build a torchvision-shaped state_dict from OUR module's param shapes
    (validates the importer's name walk + OIHW transpose end-to-end)."""
    model = InceptionV3Pool3()
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))
    )["params"]
    flat = traverse_util.flatten_dict(shapes, sep=".")
    sd = {}
    for k, s in flat.items():
        if k.endswith(".conv.kernel"):
            prefix = k[: -len(".conv.kernel")]
            kh, kw, cin, cout = s.shape
            sd[f"{prefix}.conv.weight"] = rng.randn(cout, cin, kh, kw).astype(np.float32) * 0.05
            sd[f"{prefix}.bn.weight"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
            sd[f"{prefix}.bn.bias"] = rng.randn(cout).astype(np.float32) * 0.1
            sd[f"{prefix}.bn.running_mean"] = rng.randn(cout).astype(np.float32) * 0.1
            sd[f"{prefix}.bn.running_var"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
    # the real torchvision checkpoint also carries fc + AuxLogits — the
    # importer must skip them
    sd["fc.weight"] = rng.randn(1000, 2048).astype(np.float32)
    sd["AuxLogits.conv0.conv.weight"] = rng.randn(128, 768, 1, 1).astype(np.float32)
    sd["AuxLogits.conv0.bn.weight"] = np.ones(128, np.float32)
    sd["AuxLogits.conv0.bn.bias"] = np.zeros(128, np.float32)
    sd["AuxLogits.conv0.bn.running_mean"] = np.zeros(128, np.float32)
    sd["AuxLogits.conv0.bn.running_var"] = np.ones(128, np.float32)
    return sd


def test_import_and_pool3_features():
    rng = np.random.RandomState(0)
    sd = _synthetic_torchvision_sd(rng)
    params = import_inception_v3(sd)
    assert "AuxLogits" not in params["params"]

    model = InceptionV3Pool3()
    imgs = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    feats = model.apply(params, preprocess(imgs, size=75))
    assert feats.shape == (2, 2048)
    assert np.all(np.isfinite(np.array(feats)))

    # identical sets → FID 0; disjoint sets → FID > 0
    f = np.array(model.apply(params, preprocess(imgs, size=75)), np.float64)
    base = rng.randn(64, 2048)
    same = fid_from_features(base, base.copy())
    other = fid_from_features(base, base + 1.0)
    assert same < 1e-6 and other > 1.0


def test_fid_variant_pools_match_pytorch_fid_semantics():
    """The canonical pt_inception block deltas: count_include_pad=False
    branch avg-pools (FIDInceptionA/C/E_1) and the E_2 max-pool branch —
    numerically vs torch.nn.functional, which is what pytorch-fid calls."""
    import torch.nn.functional as F

    from flash_diffusion_tpu.models.inception import _avg_pool3, _max_pool3s1

    torch.manual_seed(1)
    xt = torch.randn(2, 5, 9, 9)
    xj = jnp.asarray(xt.numpy().transpose(0, 2, 3, 1))

    ref_fid = F.avg_pool2d(xt, 3, stride=1, padding=1, count_include_pad=False)
    ref_tv = F.avg_pool2d(xt, 3, stride=1, padding=1, count_include_pad=True)
    ref_max = F.max_pool2d(xt, 3, stride=1, padding=1)
    np.testing.assert_allclose(
        np.array(_avg_pool3(xj, fid=True)).transpose(0, 3, 1, 2),
        ref_fid.numpy(), rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.array(_avg_pool3(xj, fid=False)).transpose(0, 3, 1, 2),
        ref_tv.numpy(), rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.array(_max_pool3s1(xj)).transpose(0, 3, 1, 2),
        ref_max.numpy(), rtol=1e-5, atol=1e-5,
    )
    # the edge-window divisor differs → the two avg variants must differ
    assert not np.allclose(ref_fid.numpy(), ref_tv.numpy())


def test_fid_variant_changes_trunk_output_with_same_params():
    """fid_variant flips pooling semantics only: same param tree loads into
    both variants, outputs differ (the pools sit inside Mixed blocks)."""
    rng = np.random.RandomState(1)
    sd = _synthetic_torchvision_sd(rng)
    params = import_inception_v3(sd)
    imgs = jnp.asarray(rng.uniform(-1, 1, (1, 75, 75, 3)).astype(np.float32))
    tv = InceptionV3Pool3(fid_variant=False).apply(params, imgs)
    fid = InceptionV3Pool3(fid_variant=True).apply(params, imgs)
    assert tv.shape == fid.shape == (1, 2048)
    assert np.all(np.isfinite(np.array(tv))) and np.all(np.isfinite(np.array(fid)))
    assert not np.allclose(np.array(tv), np.array(fid))
