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
