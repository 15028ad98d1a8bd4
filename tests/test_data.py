"""Data pipeline: tar streaming, filters, mappers, collation (hermetic —
fixtures build tiny tar shards on the fly; reference model:
tests/test_dataset/*)."""

import io
import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from flash_diffusion_tpu.data import (
    CannyEdgeMapper,
    CannyEdgeMapperConfig,
    DataModuleConfig,
    DataPipeline,
    FilterOnCondition,
    FilterOnConditionConfig,
    ImageTransformMapper,
    ImageTransformMapperConfig,
    KeyFilter,
    KeyFilterConfig,
    KeyRenameMapper,
    KeyRenameMapperConfig,
    KeysFromJSONMapper,
    KeysFromJSONMapperConfig,
    MapperWrapper,
    RescaleMapper,
    RescaleMapperConfig,
    SelectKeysMapper,
    SelectKeysMapperConfig,
    custom_collation_fn,
)


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    root = tmp_path_factory.mktemp("shards")
    paths = []
    idx = 0
    for s in range(2):
        path = str(root / f"{s:06d}.tar")
        with tarfile.open(path, "w") as tf:
            for _ in range(6):
                img = Image.fromarray(
                    (np.random.default_rng(idx).random((32, 32, 3)) * 255).astype(np.uint8)
                )
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{idx:06d}.png")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                meta = json.dumps(
                    {"caption": f"sample {idx}", "aesthetic_score": 5 + (idx % 3)}
                ).encode()
                info = tarfile.TarInfo(f"{idx:06d}.json")
                info.size = len(meta)
                tf.addfile(info, io.BytesIO(meta))
                idx += 1
        paths.append(path)
    return paths


def standard_chain():
    return [
        KeyFilter(KeyFilterConfig(keys=["png", "json"])),
        SelectKeysMapper(SelectKeysMapperConfig(keys=["png", "json"])),
        MapperWrapper(
            [
                KeysFromJSONMapper(
                    KeysFromJSONMapperConfig(
                        key="json", keys_to_extract=["caption", "aesthetic_score"],
                        remove_original=True, strict=False,
                    )
                ),
                KeyRenameMapper(KeyRenameMapperConfig(key_map={"png": "image", "caption": "text"})),
                ImageTransformMapper(
                    ImageTransformMapperConfig(
                        key="image",
                        transforms=[
                            {"name": "Resize", "size": [16, 16]},
                            {"name": "CenterCrop", "size": [16, 16]},
                            {"name": "ToTensor"},
                        ],
                    )
                ),
                RescaleMapper(RescaleMapperConfig(key="image")),
            ]
        ),
        FilterOnCondition(
            FilterOnConditionConfig(condition_key="aesthetic_score"), lambda v: v >= 6
        ),
    ]


def test_pipeline_end_to_end(shards):
    cfg = DataModuleConfig(
        shards_path_or_urls=shards, per_worker_batch_size=2, num_workers=2,
        shuffle_buffer_size=4,
    )
    pipe = DataPipeline(cfg, standard_chain())
    batches = list(pipe.batches(epoch=0))
    assert batches, "no batches produced"
    b = batches[0]
    assert b["image"].shape == (2, 16, 16, 3)
    assert b["image"].min() >= -1.0 and b["image"].max() <= 1.0
    assert isinstance(b["text"], list) and len(b["text"]) == 2
    # aesthetic filter kept only scores >= 6 (2 of 3 per cycle)
    total = sum(batch["image"].shape[0] for batch in batches)
    assert total <= 8


def test_host_shard_split(shards):
    cfg = DataModuleConfig(shards_path_or_urls=shards, shuffle_shards=False)
    p0 = DataPipeline(cfg, process_index=0, process_count=2)
    p1 = DataPipeline(cfg, process_index=1, process_count=2)
    assert p0._host_shards(0) == [shards[0]]
    assert p1._host_shards(0) == [shards[1]]


def test_corrupt_shard_warn_and_continue(tmp_path, shards):
    bad = str(tmp_path / "bad.tar")
    with open(bad, "wb") as f:
        f.write(b"this is not a tar file")
    cfg = DataModuleConfig(
        shards_path_or_urls=[bad] + list(shards), per_worker_batch_size=2,
        num_workers=1, shuffle_buffer_size=1, shuffle_shards=False,
    )
    pipe = DataPipeline(cfg, standard_chain())
    batches = list(pipe.batches(epoch=0))
    assert batches, "pipeline must survive a corrupt shard"


def test_collation_common_keys_and_types():
    samples = [
        {"a": np.ones((2, 2)), "t": "x", "s": 1.0, "extra": 1},
        {"a": np.zeros((2, 2)), "t": "y", "s": 2.0},
    ]
    b = custom_collation_fn(samples)
    assert set(b.keys()) == {"a", "t", "s"}
    assert b["a"].shape == (2, 2, 2)
    assert b["t"] == ["x", "y"]
    assert np.allclose(b["s"], [1.0, 2.0])


def test_canny_mapper_shapes():
    img = np.zeros((32, 32, 3), np.float32)
    img[8:24, 8:24] = 1.0
    out = CannyEdgeMapper(CannyEdgeMapperConfig())({"image": img})
    edge = out["edge"]
    assert edge.shape == (32, 32, 3)
    assert edge.max() == 1.0 and edge.min() == 0.0
    # edges concentrated near the square boundary
    assert edge[:, :, 0][6:26, 6:26].sum() > edge[:, :, 0].sum() * 0.8


def test_conditional_key_rename():
    m = KeyRenameMapper(
        KeyRenameMapperConfig(
            key_map={"a": "b"}, condition_key="flag", else_key_map={"a": "c"}
        ),
        condition=lambda v: bool(v),
    )
    assert "b" in m({"a": 1, "flag": True})
    assert "c" in m({"a": 1, "flag": False})


def test_pipe_shard_streaming(shards):
    """pipe: shard specs stream through a subprocess (wds gopen analog)."""
    from flash_diffusion_tpu.data.dataset import iter_tar_samples

    samples = list(iter_tar_samples(f"pipe:cat {shards[0]}"))
    assert len(samples) == 6
    assert all("png" in s and "json" in s for s in samples)


def test_url_shard_streaming(shards):
    """http:// shard specs stream over a loopback server."""
    import http.server
    import threading
    import functools
    import os

    from flash_diffusion_tpu.data.dataset import iter_tar_samples

    directory = os.path.dirname(shards[0])
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=directory
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/{os.path.basename(shards[0])}"
        samples = list(iter_tar_samples(url))
        assert len(samples) == 6
        # and through the full pipeline
        cfg = DataModuleConfig(
            shards_path_or_urls=[url], per_worker_batch_size=2, num_workers=1,
            shuffle_buffer_size=1,
        )
        pipe = DataPipeline(cfg, standard_chain())
        batches = list(pipe.batches(epoch=0))
        assert batches and batches[0]["image"].shape == (2, 16, 16, 3)
    finally:
        srv.shutdown()


def test_bad_url_warn_and_continue():
    from flash_diffusion_tpu.data.dataset import iter_tar_samples

    assert list(iter_tar_samples("http://127.0.0.1:1/none.tar")) == []
    assert list(iter_tar_samples("pipe:false")) == []


def test_process_worker_backend(shards):
    """fork()ed decode workers produce the same sample set as threads."""
    cfg_t = DataModuleConfig(
        shards_path_or_urls=shards, per_worker_batch_size=2, num_workers=2,
        shuffle_buffer_size=1, shuffle_shards=False,
    )
    cfg_p = DataModuleConfig(
        shards_path_or_urls=shards, per_worker_batch_size=2, num_workers=2,
        shuffle_buffer_size=1, shuffle_shards=False, worker_backend="process",
    )
    keys_t = sorted(s["__key__"] for s in DataPipeline(cfg_t).samples(0))
    keys_p = sorted(s["__key__"] for s in DataPipeline(cfg_p).samples(0))
    assert keys_p == keys_t and len(keys_p) == 12


def test_abandoned_iterator_reaps_workers(shards):
    """Closing the sample iterator mid-epoch terminates/joins workers
    (thread and process backends) instead of leaking them."""
    import threading

    for backend in ("thread", "process"):
        cfg = DataModuleConfig(
            shards_path_or_urls=shards, per_worker_batch_size=2, num_workers=2,
            shuffle_buffer_size=1, shuffle_shards=False, worker_backend=backend,
        )
        before = threading.active_count()
        it = DataPipeline(cfg).samples(0)
        next(it)
        it.close()  # runs the generator's finally: stop + join/terminate
        assert threading.active_count() <= before + 1, backend


def test_brace_expansion():
    from flash_diffusion_tpu.data.dataset import expand_shards

    out = expand_shards(["s/{00000..00002}.tar", "plain.tar"])
    assert out == ["s/00000.tar", "s/00001.tar", "s/00002.tar", "plain.tar"]
    # nested ranges expand recursively
    out = expand_shards(["{0..1}/{00..01}.tar"])
    assert out == ["0/00.tar", "0/01.tar", "1/00.tar", "1/01.tar"]


def test_jpeg_draft_decode(tmp_path):
    """decode_draft_size decodes JPEG at a reduced DCT scale that still
    covers the requested size; non-JPEG formats are untouched."""
    import io as _io

    from PIL import Image

    from flash_diffusion_tpu.data.dataset import _decode_member

    buf = _io.BytesIO()
    Image.new("RGB", (2048, 2048)).save(buf, "JPEG")
    data = buf.getvalue()
    full = _decode_member("x.jpg", data, "pil")
    assert full.size == (2048, 2048)
    drafted = _decode_member("x.jpg", data, "pil", draft_size=512)
    # libjpeg picks the smallest 1/2^k scale covering 512 -> exactly 512 here
    assert 512 <= drafted.size[0] < 2048 and drafted.size[0] == drafted.size[1]

    buf = _io.BytesIO()
    Image.new("RGB", (256, 256)).save(buf, "PNG")
    png = _decode_member("x.png", buf.getvalue(), "pil", draft_size=64)
    assert png.size == (256, 256)


def test_aspect_bucketing_pipeline(tmp_path):
    """⊕ aspect bucketing: mixed-aspect sources route to a fixed bucket
    ladder, every batch is one (h, w) shape, and the SDXL micro-cond
    tuples reflect the REAL geometry (data/bucketing.py)."""
    from flash_diffusion_tpu.data import (
        BucketAssignMapper,
        BucketAssignMapperConfig,
        DataPipeline,
        make_buckets,
    )

    path = str(tmp_path / "mixed.tar")
    sizes = [(96, 40), (40, 96), (64, 64)] * 4  # (w, h) PIL order
    with tarfile.open(path, "w") as tf:
        for i, wh in enumerate(sizes):
            img = Image.fromarray(
                (np.random.default_rng(i).random((wh[1], wh[0], 3)) * 255).astype(np.uint8)
            )
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            info = tarfile.TarInfo(f"{i:06d}.png")
            info.size = len(buf.getvalue())
            tf.addfile(info, io.BytesIO(buf.getvalue()))

    ladder = make_buckets(64, 16, 2.0)
    assert (64, 64) in ladder
    mapper = BucketAssignMapper(
        BucketAssignMapperConfig(key="png", base_size=64, stride=16, max_aspect=2.0)
    )
    cfg = DataModuleConfig(
        shards_path_or_urls=[path], per_worker_batch_size=2, num_workers=1,
        shuffle_buffer_size=1, aspect_bucketing=True, seed=0,
    )
    pipe = DataPipeline(cfg, [mapper], process_index=0, process_count=1)
    shapes = set()
    n_batches = 0
    for b in pipe.batches(epoch=0):
        n_batches += 1
        img = np.asarray(b["png"])
        assert img.shape[0] == 2  # fixed batch size
        assert img.shape[1] % 16 == 0 and img.shape[2] % 16 == 0
        assert img.shape[1] * img.shape[2] <= 64 * 64
        shapes.add(img.shape[1:3])
        assert "__bucket__" not in b
        # micro-conds reflect the true original sizes
        assert b["original_size_as_tuple"].shape == (2, 2)
        assert set(map(tuple, b["original_size_as_tuple"].astype(int))) <= {
            (40, 96), (96, 40), (64, 64)
        }
    assert n_batches == 6  # 12 samples, batch 2, uniform per-aspect counts
    assert len(shapes) == 3  # tall, wide, square — never mixed in a batch


def test_native_decoder_pipeline(tmp_path):
    """⊕ native C++ data-plane (data/native/fastjpeg.cpp): raw_image decode
    mode + fused decode/resize/crop/normalize mapper — one GIL-free call
    per image. Skips where the toolchain/libjpeg is absent."""
    from flash_diffusion_tpu.data.native_decode import (
        NativeDecodeMapper,
        NativeDecodeMapperConfig,
        is_available,
    )

    if not is_available():
        pytest.skip("native decoder unavailable")

    path = str(tmp_path / "s.tar")
    with tarfile.open(path, "w") as tf:
        for i in range(6):
            img = Image.fromarray(
                (np.random.default_rng(i).random((80, 48, 3)) * 255).astype(np.uint8)
            )
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            info = tarfile.TarInfo(f"{i:06d}.jpg")
            info.size = len(buf.getvalue())
            tf.addfile(info, io.BytesIO(buf.getvalue()))
            meta = json.dumps({"caption": f"s{i}"}).encode()
            info = tarfile.TarInfo(f"{i:06d}.json")
            info.size = len(meta)
            tf.addfile(info, io.BytesIO(meta))

    chain = [
        KeysFromJSONMapper(
            KeysFromJSONMapperConfig(
                key="json", keys_to_extract=["caption"], remove_original=True,
                strict=False,
            )
        ),
        KeyRenameMapper(KeyRenameMapperConfig(key_map={"jpg": "image", "caption": "text"})),
        NativeDecodeMapper(
            NativeDecodeMapperConfig(key="image", height=32, width=32, emit_micro_conds=True)
        ),
    ]
    cfg = DataModuleConfig(
        shards_path_or_urls=[path], per_worker_batch_size=3, num_workers=1,
        shuffle_buffer_size=1, decoder="raw_image",
    )
    pipe = DataPipeline(cfg, chain, process_index=0, process_count=1)
    n = 0
    for b in pipe.batches(epoch=0):
        n += 1
        img = np.asarray(b["image"])
        assert img.shape == (3, 32, 32, 3) and img.dtype == np.float32
        assert -1.0 <= img.min() and img.max() <= 1.0
        # json decoded normally in raw_image mode; captions survive
        assert list(b["text"]) == [t for t in b["text"] if t.startswith("s")]
        assert np.all(b["original_size_as_tuple"] == [80.0, 48.0])
    assert n == 2
