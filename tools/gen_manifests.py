"""Generate key/shape manifests of the real HF checkpoints (no weights).

Zero-egress substitute for real published-weight validation (the #1
residual risk named in VERDICT r3): the names and shapes of every tensor
in the public checkpoints are public metadata. This tool re-derives them:

- CLIP / T5 text encoders: EXACTLY, by instantiating the real
  ``transformers`` model classes on the torch meta device with the
  published architecture configs (no downloads, no RAM);
- UNet / VAE / Pixart DiT / SD3 MMDiT: from an explicit encoding of
  diffusers' state-dict naming scheme (the same scheme the importers in
  flash_diffusion_tpu/utils/hf.py consume), parameterized by the published
  architecture configs.

Output: tests/manifests/<name>.txt with one ``key shape`` line per tensor
(shape as comma-joined ints). Lines ending in `` ?`` are optional keys
(buffers like position_ids that some checkpoint snapshots carry and the
importers deliberately ignore).

tests/test_manifest_coverage.py asserts every importer consumes every
non-optional manifest key and produces a param tree whose avals match the
flax model's init exactly.

Checkpoint sources encoded (names+shapes public):
  runwayml/stable-diffusion-v1-5 (unet, vae, text_encoder)
  stabilityai/stable-diffusion-xl-base-1.0 (unet, vae, text_encoder{,_2})
  PixArt-alpha/PixArt-XL-2-1024-MS (transformer; T5-XXL text encoder)
  stabilityai/stable-diffusion-3-medium-diffusers (transformer, vae,
    text_encoder{,_2}, text_encoder_3)
"""

import os
import sys

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "manifests")


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------
class M(dict):
    def conv(self, name, o, i, k=3, bias=True):
        self[f"{name}.weight"] = (o, i, k, k)
        if bias:
            self[f"{name}.bias"] = (o,)

    def lin(self, name, o, i, bias=True):
        self[f"{name}.weight"] = (o, i)
        if bias:
            self[f"{name}.bias"] = (o,)

    def norm(self, name, c):
        self[f"{name}.weight"] = (c,)
        self[f"{name}.bias"] = (c,)


# ---------------------------------------------------------------------------
# diffusers UNet2DConditionModel
# ---------------------------------------------------------------------------
def unet_manifest(
    block_out, down_types, lpb, tlpb, cd, in_ch=4, out_ch=4,
    add_embedding_in=None, linear_proj=True,
):
    m = M()
    temb = 4 * block_out[0]
    n = len(block_out)
    m.conv("conv_in", block_out[0], in_ch)
    m.lin("time_embedding.linear_1", temb, block_out[0])
    m.lin("time_embedding.linear_2", temb, temb)
    if add_embedding_in is not None:
        m.lin("add_embedding.linear_1", temb, add_embedding_in)
        m.lin("add_embedding.linear_2", temb, temb)

    def resnet(key, i, o, with_temb=True):
        m.norm(f"{key}.norm1", i)
        m.conv(f"{key}.conv1", o, i)
        if with_temb:
            m.lin(f"{key}.time_emb_proj", o, temb)
        m.norm(f"{key}.norm2", o)
        m.conv(f"{key}.conv2", o, o)
        if i != o:
            m.conv(f"{key}.conv_shortcut", o, i, k=1)

    def attention(key, q_dim, kv_dim, bias=False):
        m.lin(f"{key}.to_q", q_dim, q_dim, bias=bias)
        m.lin(f"{key}.to_k", q_dim, kv_dim, bias=bias)
        m.lin(f"{key}.to_v", q_dim, kv_dim, bias=bias)
        m.lin(f"{key}.to_out.0", q_dim, q_dim)

    def spatial_tf(key, c, depth):
        m.norm(f"{key}.norm", c)
        if linear_proj:
            m.lin(f"{key}.proj_in", c, c)
            m.lin(f"{key}.proj_out", c, c)
        else:
            m.conv(f"{key}.proj_in", c, c, k=1)
            m.conv(f"{key}.proj_out", c, c, k=1)
        for k in range(depth):
            b = f"{key}.transformer_blocks.{k}"
            m.norm(f"{b}.norm1", c)
            attention(f"{b}.attn1", c, c)
            m.norm(f"{b}.norm2", c)
            attention(f"{b}.attn2", c, cd)
            m.norm(f"{b}.norm3", c)
            m.lin(f"{b}.ff.net.0.proj", 8 * c, c)  # GEGLU: gate + value
            m.lin(f"{b}.ff.net.2", c, 4 * c)

    ch = block_out[0]
    for i, bt in enumerate(down_types):
        out = block_out[i]
        for j in range(lpb):
            resnet(f"down_blocks.{i}.resnets.{j}", ch if j == 0 else out, out)
            if bt == "CrossAttnDownBlock2D":
                spatial_tf(f"down_blocks.{i}.attentions.{j}", out, tlpb[i])
        ch = out
        if i < n - 1:
            m.conv(f"down_blocks.{i}.downsamplers.0.conv", out, out)

    c_last = block_out[-1]
    resnet("mid_block.resnets.0", c_last, c_last)
    resnet("mid_block.resnets.1", c_last, c_last)
    spatial_tf("mid_block.attentions.0", c_last, tlpb[-1])

    rev = list(reversed(block_out))
    out = rev[0]
    for ui in range(n):
        prev_out, out = out, rev[ui]
        inp = rev[min(ui + 1, n - 1)]
        lvl = n - 1 - ui
        for j in range(lpb + 1):
            skip = inp if j == lpb else out
            rin = prev_out if j == 0 else out
            resnet(f"up_blocks.{ui}.resnets.{j}", rin + skip, out)
            if down_types[lvl] == "CrossAttnDownBlock2D":
                spatial_tf(f"up_blocks.{ui}.attentions.{j}", out, tlpb[lvl])
        if ui < n - 1:
            m.conv(f"up_blocks.{ui}.upsamplers.0.conv", out, out)

    m.norm("conv_norm_out", block_out[0])
    m.conv("conv_out", out_ch, block_out[0])
    return m


# ---------------------------------------------------------------------------
# diffusers AutoencoderKL
# ---------------------------------------------------------------------------
def vae_manifest(latent=4, block_out=(128, 256, 512, 512), lpb=2, quant_convs=True):
    m = M()
    n = len(block_out)

    def resnet(key, i, o):
        m.norm(f"{key}.norm1", i)
        m.conv(f"{key}.conv1", o, i)
        m.norm(f"{key}.norm2", o)
        m.conv(f"{key}.conv2", o, o)
        if i != o:
            m.conv(f"{key}.conv_shortcut", o, i, k=1)

    def mid(prefix, c):
        resnet(f"{prefix}.mid_block.resnets.0", c, c)
        resnet(f"{prefix}.mid_block.resnets.1", c, c)
        a = f"{prefix}.mid_block.attentions.0"
        m.norm(f"{a}.group_norm", c)
        for p in ("to_q", "to_k", "to_v"):
            m.lin(f"{a}.{p}", c, c)
        m.lin(f"{a}.to_out.0", c, c)

    m.conv("encoder.conv_in", block_out[0], 3)
    ch = block_out[0]
    for i in range(n):
        out = block_out[i]
        for j in range(lpb):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", ch if j == 0 else out, out)
        ch = out
        if i < n - 1:
            m.conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", out, out)
    mid("encoder", block_out[-1])
    m.norm("encoder.conv_norm_out", block_out[-1])
    m.conv("encoder.conv_out", 2 * latent, block_out[-1])

    m.conv("decoder.conv_in", block_out[-1], latent)
    mid("decoder", block_out[-1])
    rev = list(reversed(block_out))
    ch = rev[0]
    for ui in range(n):
        out = rev[ui]
        for j in range(lpb + 1):
            resnet(f"decoder.up_blocks.{ui}.resnets.{j}", ch if j == 0 else out, out)
        ch = out
        if ui < n - 1:
            m.conv(f"decoder.up_blocks.{ui}.upsamplers.0.conv", out, out)
    m.norm("decoder.conv_norm_out", block_out[0])
    m.conv("decoder.conv_out", 3, block_out[0])

    if quant_convs:
        m.conv("quant_conv", 2 * latent, 2 * latent, k=1)
        m.conv("post_quant_conv", latent, latent, k=1)
    return m


# ---------------------------------------------------------------------------
# diffusers PixArtTransformer2DModel (PixArt-XL-2-1024-MS)
# ---------------------------------------------------------------------------
def pixart_manifest(depth=28, d=1152, caption=4096, in_ch=4, out_ch=8, patch=2, micro_cond=True):
    m = M()
    m.conv("pos_embed.proj", d, in_ch, k=patch)
    m.lin("caption_projection.linear_1", d, caption)
    m.lin("caption_projection.linear_2", d, d)
    m.lin("adaln_single.emb.timestep_embedder.linear_1", d, 256)
    m.lin("adaln_single.emb.timestep_embedder.linear_2", d, d)
    if micro_cond:
        sz = d // 3  # PixArtAlphaCombinedTimestepSizeEmbeddings size_emb_dim
        for name in ("resolution_embedder", "aspect_ratio_embedder"):
            m.lin(f"adaln_single.emb.{name}.linear_1", sz, 256)
            m.lin(f"adaln_single.emb.{name}.linear_2", sz, sz)
    m.lin("adaln_single.linear", 6 * d, d)
    for i in range(depth):
        b = f"transformer_blocks.{i}"
        m[f"{b}.scale_shift_table"] = (6, d)
        for attn, kv in (("attn1", d), ("attn2", d)):
            for p in ("to_q", "to_k", "to_v"):
                m.lin(f"{b}.{attn}.{p}", d, kv)  # attention_bias=True
            m.lin(f"{b}.{attn}.to_out.0", d, d)
        m.lin(f"{b}.ff.net.0.proj", 4 * d, d)  # gelu-approximate (not GEGLU)
        m.lin(f"{b}.ff.net.2", d, 4 * d)
    m["scale_shift_table"] = (2, d)
    m.lin("proj_out", patch * patch * out_ch, d)
    return m


# ---------------------------------------------------------------------------
# diffusers SD3Transformer2DModel (sd3-medium)
# ---------------------------------------------------------------------------
def sd3_manifest(depth=24, d=1536, joint=4096, pooled=2048, in_ch=16, out_ch=16, patch=2):
    m = M()
    m.conv("pos_embed.proj", d, in_ch, k=patch)
    m.lin("context_embedder", d, joint)
    m.lin("time_text_embed.timestep_embedder.linear_1", d, 256)
    m.lin("time_text_embed.timestep_embedder.linear_2", d, d)
    m.lin("time_text_embed.text_embedder.linear_1", d, pooled)
    m.lin("time_text_embed.text_embedder.linear_2", d, d)
    for i in range(depth):
        b = f"transformer_blocks.{i}"
        last = i == depth - 1  # context_pre_only block
        m.lin(f"{b}.norm1.linear", 6 * d, d)
        m.lin(f"{b}.norm1_context.linear", (2 if last else 6) * d, d)
        for p in ("to_q", "to_k", "to_v"):
            m.lin(f"{b}.attn.{p}", d, d)
            m.lin(f"{b}.attn.add_{p[3:]}_proj", d, d)
        m.lin(f"{b}.attn.to_out.0", d, d)
        m.lin(f"{b}.ff.net.0.proj", 4 * d, d)  # gelu-approximate
        m.lin(f"{b}.ff.net.2", d, 4 * d)
        if not last:
            m.lin(f"{b}.attn.to_add_out", d, d)
            m.lin(f"{b}.ff_context.net.0.proj", 4 * d, d)
            m.lin(f"{b}.ff_context.net.2", d, 4 * d)
    m.lin("norm_out.linear", 2 * d, d)
    m.lin("proj_out", patch * patch * out_ch, d)
    return m


# ---------------------------------------------------------------------------
# transformers text encoders (EXACT, via torch meta device)
# ---------------------------------------------------------------------------
def clip_manifest(hidden, layers, heads, intermediate, projection_dim=None):
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel, CLIPTextModelWithProjection

    cfg = CLIPTextConfig(
        vocab_size=49408, hidden_size=hidden, intermediate_size=intermediate,
        num_hidden_layers=layers, num_attention_heads=heads,
        max_position_embeddings=77, projection_dim=projection_dim or hidden,
        hidden_act="gelu" if hidden == 1280 else "quick_gelu",
    )
    cls = CLIPTextModelWithProjection if projection_dim else CLIPTextModel
    with torch.device("meta"):
        model = cls(cfg)
    m = M({k: tuple(v.shape) for k, v in model.state_dict().items()})
    # older checkpoint snapshots ship the position_ids buffer; optional
    m["text_model.embeddings.position_ids?"] = (1, 77)
    return m


def t5_manifest(d_model=4096, d_ff=10240, layers=24, heads=64, d_kv=64):
    import torch
    from transformers import T5Config, T5EncoderModel

    cfg = T5Config(
        vocab_size=32128, d_model=d_model, d_ff=d_ff, num_layers=layers,
        num_heads=heads, d_kv=d_kv, feed_forward_proj="gated-gelu",
        is_encoder_decoder=False,
    )
    with torch.device("meta"):
        model = T5EncoderModel(cfg)
    m = M({k: tuple(v.shape) for k, v in model.state_dict().items()})
    # encoder.embed_tokens.weight is TIED to shared.weight (same tensor,
    # two state-dict entries); the importer reads the canonical name only
    if "encoder.embed_tokens.weight" in m:
        m["encoder.embed_tokens.weight?"] = m.pop("encoder.embed_tokens.weight")
    return m


# ---------------------------------------------------------------------------
# InceptionV3 (FID tower) — torchvision naming; no torchvision in this image,
# so the scheme is encoded explicitly (it is also what pt_inception uses)
# ---------------------------------------------------------------------------
def inception_manifest(fid=False):
    """fid=False: torchvision inception_v3_google (aux head, 1000-class fc).
    fid=True: pytorch-fid pt_inception-2015-12-05 (no aux, 1008-class fc)."""
    m = M()

    def bconv(name, o, i, kh, kw=None):
        kw = kh if kw is None else kw
        m[f"{name}.conv.weight"] = (o, i, kh, kw)
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            m[f"{name}.bn.{suffix}"] = (o,)
        m[f"{name}.bn.num_batches_tracked?"] = ()

    def block_a(p, c_in, pool_features):
        bconv(f"{p}.branch1x1", 64, c_in, 1)
        bconv(f"{p}.branch5x5_1", 48, c_in, 1)
        bconv(f"{p}.branch5x5_2", 64, 48, 5)
        bconv(f"{p}.branch3x3dbl_1", 64, c_in, 1)
        bconv(f"{p}.branch3x3dbl_2", 96, 64, 3)
        bconv(f"{p}.branch3x3dbl_3", 96, 96, 3)
        bconv(f"{p}.branch_pool", pool_features, c_in, 1)
        return 64 + 64 + 96 + pool_features

    def block_c(p, c_in, c7):
        bconv(f"{p}.branch1x1", 192, c_in, 1)
        bconv(f"{p}.branch7x7_1", c7, c_in, 1)
        bconv(f"{p}.branch7x7_2", c7, c7, 1, 7)
        bconv(f"{p}.branch7x7_3", 192, c7, 7, 1)
        bconv(f"{p}.branch7x7dbl_1", c7, c_in, 1)
        bconv(f"{p}.branch7x7dbl_2", c7, c7, 7, 1)
        bconv(f"{p}.branch7x7dbl_3", c7, c7, 1, 7)
        bconv(f"{p}.branch7x7dbl_4", c7, c7, 7, 1)
        bconv(f"{p}.branch7x7dbl_5", 192, c7, 1, 7)
        bconv(f"{p}.branch_pool", 192, c_in, 1)
        return 768

    def block_e(p, c_in):
        bconv(f"{p}.branch1x1", 320, c_in, 1)
        bconv(f"{p}.branch3x3_1", 384, c_in, 1)
        bconv(f"{p}.branch3x3_2a", 384, 384, 1, 3)
        bconv(f"{p}.branch3x3_2b", 384, 384, 3, 1)
        bconv(f"{p}.branch3x3dbl_1", 448, c_in, 1)
        bconv(f"{p}.branch3x3dbl_2", 384, 448, 3)
        bconv(f"{p}.branch3x3dbl_3a", 384, 384, 1, 3)
        bconv(f"{p}.branch3x3dbl_3b", 384, 384, 3, 1)
        bconv(f"{p}.branch_pool", 192, c_in, 1)
        return 2048

    bconv("Conv2d_1a_3x3", 32, 3, 3)
    bconv("Conv2d_2a_3x3", 32, 32, 3)
    bconv("Conv2d_2b_3x3", 64, 32, 3)
    bconv("Conv2d_3b_1x1", 80, 64, 1)
    bconv("Conv2d_4a_3x3", 192, 80, 3)
    c = block_a("Mixed_5b", 192, 32)
    c = block_a("Mixed_5c", c, 64)
    c = block_a("Mixed_5d", c, 64)
    # Mixed_6a (InceptionB)
    bconv("Mixed_6a.branch3x3", 384, c, 3)
    bconv("Mixed_6a.branch3x3dbl_1", 64, c, 1)
    bconv("Mixed_6a.branch3x3dbl_2", 96, 64, 3)
    bconv("Mixed_6a.branch3x3dbl_3", 96, 96, 3)
    c = 384 + 96 + c
    c = block_c("Mixed_6b", c, 128)
    c = block_c("Mixed_6c", c, 160)
    c = block_c("Mixed_6d", c, 160)
    c = block_c("Mixed_6e", c, 192)
    if not fid:
        # aux classifier head (training-only; the importer drops it)
        bconv("AuxLogits.conv0", 128, 768, 1)
        bconv("AuxLogits.conv1", 768, 128, 5)
        m["AuxLogits.fc.weight"] = (1000, 768)
        m["AuxLogits.fc.bias"] = (1000,)
        for k in list(m):
            if k.startswith("AuxLogits") and not k.endswith("?"):
                m[f"{k}?"] = m.pop(k)
    # Mixed_7a (InceptionD)
    bconv("Mixed_7a.branch3x3_1", 192, c, 1)
    bconv("Mixed_7a.branch3x3_2", 320, 192, 3)
    bconv("Mixed_7a.branch7x7x3_1", 192, c, 1)
    bconv("Mixed_7a.branch7x7x3_2", 192, 192, 1, 7)
    bconv("Mixed_7a.branch7x7x3_3", 192, 192, 7, 1)
    bconv("Mixed_7a.branch7x7x3_4", 192, 192, 3)
    c = 320 + 192 + c
    c = block_e("Mixed_7b", c)
    c = block_e("Mixed_7c", c)
    n_classes = 1008 if fid else 1000
    m["fc.weight?"] = (n_classes, 2048)
    m["fc.bias?"] = (n_classes,)
    return m


# ---------------------------------------------------------------------------
# LPIPS(net='vgg') — the torch ``lpips`` package full state dict
# ---------------------------------------------------------------------------
def lpips_vgg_manifest():
    m = M()
    # ScalingLayer buffers (hardcoded constants in our module → optional)
    m["scaling_layer.shift?"] = (1, 3, 1, 1)
    m["scaling_layer.scale?"] = (1, 3, 1, 1)
    # vgg16 trunk: lpips keeps torchvision's GLOBAL feature indices inside
    # per-stage slices (pretrained_networks.vgg16 add_module(str(x), ...))
    slices = [
        (1, [(0, 64, 3), (2, 64, 64)]),
        (2, [(5, 128, 64), (7, 128, 128)]),
        (3, [(10, 256, 128), (12, 256, 256), (14, 256, 256)]),
        (4, [(17, 512, 256), (19, 512, 512), (21, 512, 512)]),
        (5, [(24, 512, 512), (26, 512, 512), (28, 512, 512)]),
    ]
    for si, convs in slices:
        for idx, o, i in convs:
            m.conv(f"net.slice{si}.{idx}", o, i, 3)
    for li, ch in enumerate([64, 128, 256, 512, 512]):
        m[f"lins.{li}.model.1.weight"] = (1, ch, 1, 1)
    return m


# ---------------------------------------------------------------------------
# CLIP vision tower (ViT-L/14 w/ projection — CLIPScore / CLIP-FID)
# ---------------------------------------------------------------------------
def clip_vision_manifest(hidden=1024, layers=24, heads=16, intermediate=4096, projection_dim=768):
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig(
        hidden_size=hidden, intermediate_size=intermediate,
        num_hidden_layers=layers, num_attention_heads=heads,
        image_size=224, patch_size=14, projection_dim=projection_dim,
    )
    with torch.device("meta"):
        model = CLIPVisionModelWithProjection(cfg)
    m = M({k: tuple(v.shape) for k, v in model.state_dict().items()})
    m["vision_model.embeddings.position_ids?"] = (1, (224 // 14) ** 2 + 1)
    return m


MANIFESTS = {
    "sd15_unet": lambda: unet_manifest(
        [320, 640, 1280, 1280], ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"],
        2, [1, 1, 1, 1], 768, linear_proj=False,
    ),
    "sdxl_unet": lambda: unet_manifest(
        [320, 640, 1280], ["DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"],
        2, [1, 2, 10], 2048, add_embedding_in=2816, linear_proj=True,
    ),
    "sd_vae": lambda: vae_manifest(latent=4),
    "sd3_vae": lambda: vae_manifest(latent=16, quant_convs=False),
    "pixart_dit": pixart_manifest,
    "sd3_mmdit": sd3_manifest,
    "clip_vit_l": lambda: clip_manifest(768, 12, 12, 3072),
    "clip_bigg_proj": lambda: clip_manifest(1280, 32, 20, 5120, projection_dim=1280),
    "t5_xxl": t5_manifest,
    "inception_v3_tv": lambda: inception_manifest(fid=False),
    "inception_v3_fid": lambda: inception_manifest(fid=True),
    "lpips_vgg": lpips_vgg_manifest,
    "clip_vision_l": clip_vision_manifest,
}


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, fn in MANIFESTS.items():
        m = fn()
        path = os.path.join(OUT, f"{name}.txt")
        with open(path, "w") as f:
            for k in sorted(m):
                opt = k.endswith("?")
                # "-" encodes a SCALAR tensor (e.g. bn.num_batches_tracked)
                shape = ",".join(str(s) for s in m[k]) or "-"
                f.write(f"{k.rstrip('?')} {shape}{' ?' if opt else ''}\n")
        print(f"{name}: {len(m)} tensors -> {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
