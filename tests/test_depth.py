"""DPT depth model (MiDaS dpt_large stand-in for the reference's
MidasDetector): importer naming/layout + forward shape/finiteness, and the
DepthMapper wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from flash_diffusion_tpu.models.depth import DPTDepth, import_dpt_large


def _tiny():
    return DPTDepth(dim=32, depth=4, heads=2, patch=16, features=16, hooks=(0, 1, 2, 3))


def _synthetic_midas_sd(rng, dim=32, depth=4, features=16, grid=1 + 4):
    """Official isl-org/MiDaS dpt_large key naming, tiny shapes."""
    sd = {}

    def lin(k, i, o, bias=True):
        sd[f"{k}.weight"] = rng.randn(o, i).astype(np.float32) * 0.05
        if bias:
            sd[f"{k}.bias"] = rng.randn(o).astype(np.float32) * 0.01

    def conv(k, i, o, ks, bias=True):
        sd[f"{k}.weight"] = rng.randn(o, i, ks, ks).astype(np.float32) * 0.05
        if bias:
            sd[f"{k}.bias"] = rng.randn(o).astype(np.float32) * 0.01

    def deconv(k, i, o, ks):
        sd[f"{k}.weight"] = rng.randn(i, o, ks, ks).astype(np.float32) * 0.05
        sd[f"{k}.bias"] = rng.randn(o).astype(np.float32) * 0.01

    def norm(k, d):
        sd[f"{k}.weight"] = np.ones(d, np.float32)
        sd[f"{k}.bias"] = np.zeros(d, np.float32)

    bb = "pretrained.model"
    conv(f"{bb}.patch_embed.proj", 3, dim, 16)
    sd[f"{bb}.cls_token"] = np.zeros((1, 1, dim), np.float32)
    sd[f"{bb}.pos_embed"] = rng.randn(1, grid, dim).astype(np.float32) * 0.01
    for i in range(depth):
        k = f"{bb}.blocks.{i}"
        norm(f"{k}.norm1", dim)
        lin(f"{k}.attn.qkv", dim, 3 * dim)
        lin(f"{k}.attn.proj", dim, dim)
        norm(f"{k}.norm2", dim)
        lin(f"{k}.mlp.fc1", dim, 4 * dim)
        lin(f"{k}.mlp.fc2", 4 * dim, dim)
    for lvl in range(4):
        lin(f"pretrained.act_postprocess{lvl + 1}.0.project.0", 2 * dim, dim)
    chans = (features, features * 2, dim, dim)
    conv("pretrained.act_postprocess1.3", dim, chans[0], 1)
    deconv("pretrained.act_postprocess1.4", chans[0], chans[0], 4)
    conv("pretrained.act_postprocess2.3", dim, chans[1], 1)
    deconv("pretrained.act_postprocess2.4", chans[1], chans[1], 2)
    conv("pretrained.act_postprocess3.3", dim, chans[2], 1)
    conv("pretrained.act_postprocess4.3", dim, chans[3], 1)
    conv("pretrained.act_postprocess4.4", chans[3], chans[3], 3)
    for i, c in enumerate(chans):
        conv(f"scratch.layer{i + 1}_rn", c, features, 3, bias=False)
    for i in range(1, 5):
        k = f"scratch.refinenet{i}"
        conv(f"{k}.out_conv", features, features, 1)
        for unit in ("resConfUnit1", "resConfUnit2"):
            conv(f"{k}.{unit}.conv1", features, features, 3)
            conv(f"{k}.{unit}.conv2", features, features, 3)
    conv("scratch.output_conv.0", features, features // 2, 3)
    conv("scratch.output_conv.2", features // 2, 32, 3)
    conv("scratch.output_conv.4", 32, 1, 1)
    return sd


def test_dpt_import_and_forward():
    rng = np.random.RandomState(0)
    sd = _synthetic_midas_sd(rng)
    params = import_dpt_large(sd, depth=4)
    model = _tiny()
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    # verify the imported tree matches the module's own structure exactly
    ref_shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    from flax import traverse_util as tu

    got = tu.flatten_dict(params, sep="/")
    want = tu.flatten_dict(ref_shapes, sep="/")
    assert set(got) == set(want), set(got) ^ set(want)
    for k in want:
        assert tuple(np.shape(got[k])) == tuple(want[k].shape), k

    out = model.apply(params, x)
    assert out.shape == (1, 32, 32)
    assert np.all(np.isfinite(np.array(out))) and np.all(np.array(out) >= 0)


def test_depth_mapper_with_model_fn():
    from flash_diffusion_tpu.data.mappers import DepthMapper, DepthMapperConfig

    rng = np.random.RandomState(1)
    sd = _synthetic_midas_sd(rng)
    params = import_dpt_large(sd, depth=4)
    model = _tiny()

    def depth_fn(img):
        x = jax.image.resize(jnp.asarray(img)[None], (1, 32, 32, 3), "bilinear")
        d = np.asarray(model.apply(params, x))[0]
        return (d - d.min()) / (d.max() - d.min() + 1e-8)

    mapper = DepthMapper(DepthMapperConfig(key="image", output_key="depth"), depth_fn)
    sample = {"image": rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)}
    out = mapper(sample)
    assert out["depth"].shape == (32, 32, 3)
    assert 0.0 <= out["depth"].min() and out["depth"].max() <= 1.0
