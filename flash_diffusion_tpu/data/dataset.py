"""Streaming tar-shard data pipeline (webdataset-style, dependency-free).

Re-derivation of the reference's webdataset wiring
(reference: src/flash/data/datasets/dataset.py:13-208): shard list →
shuffle → split-by-host → split-by-worker → tar → samples grouped by key
stem → decode → filters/mappers → shuffle buffer → batches. TPU-specific
design: host sharding uses ``jax.process_index()`` (replacing wds
split_by_node); worker parallelism is a thread pool feeding a bounded queue
(Python tarfile + PIL decode release the GIL on IO); a prefetcher overlaps
host decode with device compute.

Fault tolerance mirrors ``handler=warn_and_continue``
(reference data/datasets/datasets_config.py:36): corrupt members/shards log
a warning and are skipped.
"""

from __future__ import annotations

import io
import json
import logging
import queue
import random
import tarfile
import threading
from dataclasses import field
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np
from pydantic.dataclasses import dataclass

from ..config import BaseConfig
from .collation import custom_collation_fn

logger = logging.getLogger(__name__)


@dataclass
class DataModuleConfig(BaseConfig):
    """Reference surface (data/datasets/datasets_config.py:10-43)."""

    shards_path_or_urls: List[str] = field(default_factory=list)
    per_worker_batch_size: int = 4
    num_workers: int = 2
    # thread: GIL-sharing workers (tar IO + PIL decode release the GIL some
    # of the time). process: fork()ed decode workers — one Python per core,
    # the right backend when the jpeg-decode+resize chain is CPU-bound
    # (SURVEY §7 hard part #6; ~117 ms/img at 1024² per core measured).
    worker_backend: str = "thread"  # thread | process
    shuffle_buffer_size: int = 100
    shuffle_shards: bool = True
    # pil: decode to PIL objects; raw: bytes for everything; raw_image:
    # bytes for images only (feed data/native_decode.NativeDecodeMapper —
    # the GIL-free C++ decode+resize path), normal decode for json/txt
    decoder: str = "pil"  # pil | raw | raw_image
    seed: int = 0
    drop_last: bool = True
    prefetch: int = 2
    # optional member-name rewrite before stem/ext grouping (the reference's
    # rename_files_fn hook, data/datasets/datasets_config.py:42)
    rename_files: Optional[Dict[str, str]] = None
    # JPEG draft decode: when set, libjpeg decodes directly at the smallest
    # DCT scale (1/2, 1/4, 1/8) whose result still covers (size, size) —
    # 2-5× faster decode for >2k² camera sources feeding a 1024² train res.
    # Downstream Resize/CenterCrop mappers see a smaller, still-covering
    # image. None = full-resolution decode (reference behavior).
    decode_draft_size: Optional[int] = None
    # Aspect-ratio bucketed batching (⊕, see data/bucketing.py): requires a
    # BucketAssignMapper in the chain; batches() then groups samples by
    # their __bucket__ tag so every batch is one fixed (h, w) shape.
    aspect_bucketing: bool = False


def _decode_member(
    name: str, data: bytes, decoder: str, draft_size: Optional[int] = None
) -> Any:
    ext = name.rsplit(".", 1)[-1].lower()
    if decoder == "raw":
        return data
    if decoder == "raw_image" and ext in ("jpg", "jpeg"):
        # JPEG members stay raw bytes for the downstream native decoder
        # (data/native_decode.py — libjpeg only); png/webp fall through to
        # the PIL decode below (the native mapper cover-resizes PIL images
        # too), json/txt decode normally
        return data
    if ext in ("jpg", "jpeg", "png", "webp"):
        from PIL import Image

        img = Image.open(io.BytesIO(data))
        orig_hw = (img.height, img.width)  # pre-draft TRUE size
        if draft_size is not None and img.format == "JPEG":
            img.draft("RGB", (draft_size, draft_size))
        img = img.convert("RGB")
        # the draft decode shrinks the pixels; downstream consumers that
        # condition on the real file geometry (BucketAssignMapper's SDXL
        # original_size tuple) read this instead of the drafted dims
        img.info["original_size"] = orig_hw
        return img
    if ext == "json":
        return json.loads(data)
    if ext in ("txt", "text", "caption"):
        return data.decode("utf-8")
    if ext in ("npy",):
        return np.load(io.BytesIO(data), allow_pickle=False)
    if ext in ("cls",):
        return int(data)
    return data


def expand_shards(specs: Sequence[str]) -> List[str]:
    """webdataset-style brace expansion: ``path/{00000..00042}.tar`` →
    43 zero-padded shard specs (wds SimpleShardList uses braceexpand;
    recursion handles multiple ranges)."""
    import re

    out: List[str] = []
    for s in specs:
        m = re.search(r"\{(\d+)\.\.(\d+)\}", s)
        if not m:
            out.append(s)
            continue
        width = len(m.group(1))
        lo, hi = int(m.group(1)), int(m.group(2))
        for i in range(lo, hi + 1):
            out.extend(expand_shards([s[: m.start()] + str(i).zfill(width) + s[m.end() :]]))
    return out


def _open_shard(spec: str):
    """Open a shard spec as a streaming byte source (webdataset URL/pipe
    semantics — reference data/datasets/dataset.py:75-96 accepts local
    paths, URLs, and ``pipe:`` commands via wds gopen):

    - ``pipe:CMD ...``  → stdout of the shell command,
    - ``http(s)://``    → streamed urllib response,
    - ``gs:// / s3://`` → ``gsutil cat`` / ``aws s3 cp - `` subprocess pipes,
    - ``file://`` or a plain path → local file.

    Returns (fileobj, closer)."""
    if spec.startswith("pipe:"):
        import shlex
        import subprocess

        proc = subprocess.Popen(
            shlex.split(spec[len("pipe:") :]),
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )
        return proc.stdout, lambda: (proc.stdout.close(), proc.wait())
    if spec.startswith(("http://", "https://")):
        import urllib.request

        resp = urllib.request.urlopen(spec, timeout=60)
        return resp, resp.close
    if spec.startswith("gs://"):
        return _open_shard(f"pipe:gsutil cat {spec}")
    if spec.startswith("s3://"):
        return _open_shard(f"pipe:aws s3 cp {spec} -")
    if spec.startswith("file://"):
        spec = spec[len("file://") :]
    f = open(spec, "rb")
    return f, f.close


def iter_tar_samples(
    path: str,
    decoder: str = "pil",
    rename_files: Optional[Dict[str, str]] = None,
    draft_size: Optional[int] = None,
) -> Iterator[Dict[str, Any]]:
    """Group tar members by filename stem into sample dicts keyed by
    extension (webdataset convention: 000123.jpg + 000123.json → one
    sample with keys jpg/json). ``rename_files`` maps extensions before
    grouping (rename_files_fn analog). ``path`` may be a local path, a
    URL, or a ``pipe:`` command (see :func:`_open_shard`)."""
    closer = None
    try:
        fileobj, closer = _open_shard(path)
        tf = tarfile.open(fileobj=fileobj, mode="r|*")
    except Exception as e:  # warn_and_continue
        logger.warning("skipping shard %s: %s", path, e)
        if closer is not None:
            try:
                closer()
            except Exception:
                pass
        return
    current_key, sample = None, {}
    try:
        with tf:
            for member in tf:
                if not member.isfile():
                    continue
                name = member.name
                if rename_files:
                    stem0, _, ext0 = name.partition(".")
                    if ext0 in rename_files:
                        name = f"{stem0}.{rename_files[ext0]}"
                if "." not in name:
                    continue
                stem, ext = name.split(".", 1)
                try:
                    data = tf.extractfile(member).read()
                    value = _decode_member(name, data, decoder, draft_size)
                except Exception as e:  # warn_and_continue
                    logger.warning("skipping member %s in %s: %s", name, path, e)
                    continue
                if stem != current_key:
                    if sample:
                        sample["__key__"] = current_key
                        yield sample
                    current_key, sample = stem, {}
                sample[ext.lower()] = value
        if sample:
            sample["__key__"] = current_key
            yield sample
    finally:
        try:
            closer()
        except Exception:
            pass


def _queue_put(out_q, item, stop, timeout=0.2):
    """Bounded put that gives up when the consumer signalled stop — a
    worker blocked on a full queue must not outlive an abandoned
    iterator."""
    while True:
        try:
            out_q.put(item, timeout=timeout)
            return True
        except queue.Full:
            if stop is not None and stop.is_set():
                return False


def _worker_loop(cfg, filters_mappers, shards, out_q, stop=None):
    """Decode worker body: shards → samples → filters/mappers → queue.
    Module-level so it pickles for spawn()ed process workers."""

    def apply(sample):
        for fm in filters_mappers:
            result = fm(sample)
            if result is False:
                return None
            if isinstance(result, dict):
                sample = result
        return sample

    for shard in shards:
        if stop is not None and stop.is_set():
            break
        for sample in iter_tar_samples(
            shard, cfg.decoder, cfg.rename_files, cfg.decode_draft_size
        ):
            if stop is not None and stop.is_set():
                break
            try:
                mapped = apply(sample)
            except Exception as e:  # warn_and_continue
                logger.warning("mapper error on %s: %s", sample.get("__key__"), e)
                continue
            if mapped is not None and not _queue_put(out_q, mapped, stop):
                return
    _queue_put(out_q, None, stop)


class DataPipeline:
    """Composable streaming pipeline (reference DataPipeline, dataset.py:13-145)."""

    def __init__(
        self,
        config: DataModuleConfig,
        filters_mappers: Sequence[Callable] = (),
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.config = config
        self.filters_mappers = list(filters_mappers)
        if process_index is None:
            try:
                import jax

                process_index, process_count = jax.process_index(), jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        self.process_index = process_index
        self.process_count = process_count or 1

    def _host_shards(self, epoch: int) -> List[str]:
        shards = expand_shards(self.config.shards_path_or_urls)
        if self.config.shuffle_shards:
            random.Random(self.config.seed + epoch).shuffle(shards)
        # split_by_node analog
        return shards[self.process_index :: self.process_count]

    def _apply(self, sample: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        for fm in self.filters_mappers:
            result = fm(sample)
            if result is False:
                return None
            if isinstance(result, dict):
                sample = result
        return sample

    def _worker_loop(self, shards, out_q, stop=None):
        _worker_loop(self.config, self.filters_mappers, shards, out_q, stop)

    def samples(self, epoch: int = 0) -> Iterator[Dict[str, Any]]:
        """Decoded, filtered, mapped samples with a shuffle buffer; workers
        fan out over shards (split_by_worker analog). Backend "thread"
        shares the GIL (fine when tar IO dominates); "process" runs one
        decoder per worker — the scaling path on multi-core TPU hosts.

        Process workers prefer the ``spawn`` context (fork()ing a
        multithreaded, JAX-initialized parent can deadlock in the child);
        when the config/mappers don't pickle, falls back to ``fork`` with a
        warning. Workers are terminated/joined when the consumer abandons
        the iterator mid-epoch (generator close runs the ``finally``)."""
        cfg = self.config
        shards = self._host_shards(epoch)
        if not shards:
            return
        n_workers = max(1, min(cfg.num_workers, len(shards)))

        # split_by_worker analog: worker i owns shards[i::n]
        splits = [shards[i::n_workers] for i in range(n_workers)]
        qsize = max(2 * cfg.per_worker_batch_size, 16)
        use_process = cfg.worker_backend == "process"
        stop = threading.Event()
        if use_process:
            import multiprocessing as mp
            import pickle

            payload = (cfg, self.filters_mappers)
            try:
                pickle.dumps(payload)
                ctx = mp.get_context("spawn")
            except Exception:
                logger.warning(
                    "filters/mappers are not picklable; using fork() workers — "
                    "unsafe from a multithreaded (JAX-initialized) parent"
                )
                ctx = mp.get_context("fork")
            out_q = ctx.Queue(maxsize=qsize)
            workers = [
                ctx.Process(
                    target=_worker_loop,
                    args=(cfg, self.filters_mappers, sp, out_q, None),
                    daemon=True,
                )
                for sp in splits
            ]
        else:
            out_q = queue.Queue(maxsize=qsize)
            workers = [
                threading.Thread(
                    target=_worker_loop,
                    args=(cfg, self.filters_mappers, sp, out_q, stop),
                    daemon=True,
                )
                for sp in splits
            ]

        for t in workers:
            t.start()

        try:
            rng = random.Random(cfg.seed + epoch + 1)
            buf: List[Dict[str, Any]] = []
            done = 0
            while done < n_workers:
                item = out_q.get()
                if item is None:
                    done += 1
                    continue
                if cfg.shuffle_buffer_size > 1:
                    buf.append(item)
                    if len(buf) >= cfg.shuffle_buffer_size:
                        yield buf.pop(rng.randrange(len(buf)))
                else:
                    yield item
            rng.shuffle(buf)
            yield from buf
        finally:
            stop.set()
            if use_process:
                for p in workers:
                    if p.is_alive():
                        p.terminate()
                for p in workers:
                    p.join(timeout=5)
                out_q.close()
                out_q.cancel_join_thread()
            else:
                # drain so putters blocked on a full queue see the stop flag
                while any(t.is_alive() for t in workers):
                    try:
                        out_q.get(timeout=0.1)
                    except queue.Empty:
                        pass
                for t in workers:
                    t.join(timeout=5)

    def batches(self, epoch: int = 0) -> Iterator[Dict[str, Any]]:
        cfg = self.config
        if cfg.aspect_bucketing:
            from .bucketing import bucket_batches

            yield from bucket_batches(
                self.samples(epoch),
                cfg.per_worker_batch_size,
                drop_last=cfg.drop_last,
            )
            return
        batch: List[Dict[str, Any]] = []
        for sample in self.samples(epoch):
            batch.append(sample)
            if len(batch) == cfg.per_worker_batch_size:
                yield custom_collation_fn(batch)
                batch = []
        if batch and not cfg.drop_last:
            yield custom_collation_fn(batch)

    def __iter__(self):
        epoch = 0
        while True:
            yielded = False
            for b in self.batches(epoch):
                yielded = True
                yield b
            epoch += 1
            if not yielded:
                return


class DataModule:
    """Train/eval pipeline pair (reference DataModule, dataset.py:148-208)."""

    def __init__(
        self,
        train_config: DataModuleConfig,
        train_filters_mappers: Sequence[Callable] = (),
        eval_config: Optional[DataModuleConfig] = None,
        eval_filters_mappers: Sequence[Callable] = (),
    ):
        self.train_pipeline = DataPipeline(train_config, train_filters_mappers)
        self.eval_pipeline = (
            DataPipeline(eval_config, eval_filters_mappers) if eval_config else None
        )

    def train_dataloader(self):
        return iter(self.train_pipeline)

    def eval_dataloader(self):
        return iter(self.eval_pipeline) if self.eval_pipeline else None


def prefetch_to_device(iterator, size: int = 2):
    """Overlap host pipeline with device compute via a bounded thread."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def run():
        for item in iterator:
            q.put(item)
        q.put(sentinel)

    threading.Thread(target=run, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
