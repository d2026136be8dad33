"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The image/audio codec libraries are NOT in this container, so the decode
kernel is a clearly-marked stub: with ``fake=True`` (default here) it produces
a DETERMINISTIC fake feature vector from the bytes (hash-derived), keeping the
Ray-side plumbing — schema, batch sizing, actor signature, output layout —
real and testable; with ``fake=False`` it raises ``NotImplementedError`` where
a real codec (PIL / torchvision / ffmpeg) would be called.

Scale notes: large binary payloads need SMALL batch sizes so
batch x concurrency fits worker heaps; the decode stage is a callable CLASS so
codec setup happens once per actor, not per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..synth import _hash2


class BinaryDecodeStage:
    """Actor-pool stage: binary payload -> fixed-size feature vector.

    ``__init__`` is where a real implementation loads the codec/model (once
    per actor). ``feature_dim`` fixes the output schema either way.
    """

    def __init__(self, feature_dim: int = 16, fake: bool = True):
        self.feature_dim = feature_dim
        self.fake = fake
        if not fake:
            # REAL arm, import-gated: PIL loads once per ACTOR here, never
            # per batch.  Same output schema as the fake arm by
            # construction, so the two arms are plumbing-interchangeable
            # (asserted by the gated parity pytest).
            try:
                from PIL import Image
            except ImportError as e:
                raise ImportError(
                    "real image decode requires Pillow; it is absent in "
                    "this environment — run with fake=True (deterministic "
                    "hash features, same schema)"
                ) from e
            self._Image = Image

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        # deterministic: features = hash-chain over the byte content
        arr = np.frombuffer(payload[: 8 * self.feature_dim].ljust(8 * self.feature_dim, b"\0"), dtype=np.uint64).copy()
        h = _hash2(11, arr[: self.feature_dim])
        return (h % np.uint64(10_000)).astype(np.float64) / 10_000.0

    def _real_decode(self, payload: bytes) -> np.ndarray:  # pragma: no cover
        # covered by the PIL-gated parity test where Pillow exists
        import io

        d = self.feature_dim
        try:
            img = self._Image.open(io.BytesIO(payload)).convert("L")
        except Exception:
            return np.zeros(d, np.float64)  # corrupt input -> zero vector
        px = np.asarray(img.resize((d, d)), dtype=np.float64)
        return px.mean(axis=0) / 255.0  # per-column mean pool

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._fake_decode if self.fake else self._real_decode
        payloads = batch["payload"].to_pylist()
        feats = np.stack(
            [decode(p or b"") for p in payloads]
        ) if payloads else np.zeros((0, self.feature_dim))
        vec = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float64()), self.feature_dim
        )
        out = batch.drop_columns(["payload"])
        return out.append_column("features", vec)


def decode_binary_column(
    ds: ray.data.Dataset,
    feature_dim: int = 16,
    concurrency: int | None = None,
    batch_size: int = 64,  # small: payloads are large
    fake: bool = True,
) -> ray.data.Dataset:
    from ..functions.text import pool_size

    return ds.map_batches(
        BinaryDecodeStage,
        fn_constructor_kwargs={"feature_dim": feature_dim, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or pool_size(),
    )


def decode_wav_column(
    ds: ray.data.Dataset, batch_size: int = 64
) -> ray.data.Dataset:
    """REAL audio-codec decode (stdlib ``wave`` — no external library):
    encoded WAV payload bytes -> raw 16-bit mono-interleaved PCM ``payload``
    plus ``sample_rate`` / ``channels`` metadata columns, the exact input
    shape :func:`audio_frame_features` consumes.  Undecodable payloads are
    dropped (the corrupt-input arm, like ``resize_frames``)."""

    def fn(batch: pa.Table) -> pa.Table:
        import io
        import wave

        keep, pcm, rates, chans = [], [], [], []
        for p in batch["payload"].to_pylist():
            try:
                with wave.open(io.BytesIO(p or b"")) as w:
                    if w.getsampwidth() != 2:
                        raise ValueError("only 16-bit PCM supported")
                    pcm.append(w.readframes(w.getnframes()))
                    rates.append(w.getframerate())
                    chans.append(w.getnchannels())
                keep.append(True)
            except Exception:
                keep.append(False)
        out = batch.filter(pa.array(keep)).drop_columns(["payload"])
        out = out.append_column("payload", pa.array(pcm, pa.binary()))
        out = out.append_column("sample_rate", pa.array(rates, pa.int32()))
        return out.append_column("channels", pa.array(chans, pa.int32()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def frame_sample(
    ds: ray.data.Dataset, every_n: int = 10
) -> ray.data.Dataset:
    """Video frame-sampling analog: keep every Nth row per media id —
    deterministic row decimation of a (media_id, frame_idx, payload) table."""

    def fn(batch: pa.Table) -> pa.Table:
        idx = batch["frame_idx"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(idx % every_n == 0))

    return ds.map_batches(fn, batch_format="pyarrow")


def resize_frames(
    ds: ray.data.Dataset, out_h: int, out_w: int, batch_size: int = 64
) -> ray.data.Dataset:
    """RAW-frame resize — a REAL kernel, not a codec stub: payloads are
    uncompressed ``uint8 [height, width, channels]`` buffers (the shape a
    decode stage emits), with per-row ``height``/``width``/``channels``
    metadata columns.  Nearest-neighbor index gather per frame in numpy;
    rows whose payload length doesn't match its metadata are dropped (the
    corrupt-input arm).  Small batches: payload x concurrency must fit the
    worker heap."""

    def fn(batch: pa.Table) -> pa.Table:
        hs = batch["height"].to_numpy(zero_copy_only=False)
        ws = batch["width"].to_numpy(zero_copy_only=False)
        cs = batch["channels"].to_numpy(zero_copy_only=False)
        payloads = batch["payload"].to_pylist()
        keep, out_payloads = [], []
        for i, p in enumerate(payloads):
            h, w, c = int(hs[i]), int(ws[i]), int(cs[i])
            if p is None or len(p) != h * w * c:
                keep.append(False)
                continue
            frame = np.frombuffer(p, dtype=np.uint8).reshape(h, w, c)
            yi = (np.arange(out_h) * h) // out_h
            xi = (np.arange(out_w) * w) // out_w
            out_payloads.append(frame[yi][:, xi].tobytes())
            keep.append(True)
        out = batch.filter(pa.array(keep))
        n = out.num_rows
        out = out.drop_columns(["payload", "height", "width"])
        out = out.append_column("payload", pa.array(out_payloads, pa.binary()))
        out = out.append_column("height", pa.array([out_h] * n, pa.int32()))
        out = out.append_column("width", pa.array([out_w] * n, pa.int32()))
        return out

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def audio_frame_features(
    ds: ray.data.Dataset, frame_len: int = 1024, n_frames: int = 16,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """RAW-PCM audio features — also a real kernel: payloads are int16
    little-endian PCM; emits a fixed ``n_frames``-length RMS envelope
    (windows of ``frame_len`` samples, zero-padded/truncated), normalized to
    [0, 1] by the int16 range.  The windowing/aggregation pattern is the
    same one a real fbank/MFCC stage would use."""
    need = frame_len * n_frames

    def fn(batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            raw = np.frombuffer((p or b"")[: 2 * need].ljust(2 * need, b"\0"), dtype="<i2")
            win = raw.astype(np.float64).reshape(n_frames, frame_len)
            feats.append(np.sqrt((win * win).mean(axis=1)) / 32768.0)
        arr = np.stack(feats) if feats else np.zeros((0, n_frames))
        vec = pa.FixedSizeListArray.from_arrays(
            pa.array(arr.ravel(), pa.float64()), n_frames
        )
        return batch.drop_columns(["payload"]).append_column("rms", vec)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def dhash_frames(
    ds: ray.data.Dataset,
    height: int = 8,
    width: int = 9,
    id_col: str = "media_id",
    batch_size: int = 256,
) -> ray.data.Dataset:
    """64-bit difference hash (dHash) over RAW grayscale frames — the
    standard perceptual image fingerprint, computed as a REAL vectorized
    kernel (no codec): payloads are uncompressed ``uint8 [height, width]``
    buffers (default 9x8 — the canonical dHash grid, usually produced by a
    decode+resize stage such as :func:`resize_frames`); bit ``k = r*8 + c``
    (MSB first) is 1 iff ``px[r, c] > px[r, c+1]``.  Rows whose payload
    length isn't ``height*width`` are dropped (the corrupt-input arm, same
    contract as ``resize_frames``).

    The comparison/packbits pipeline is one numpy pass over the whole
    batch; the hash is bit-reproducible in SQL from the same bytes
    (``get_bit`` over the blob's bitstring), which is what makes
    :func:`phash_dup_pairs` exactly oracle-able.
    """
    hw = height * width

    def fn(batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        keep = [p is not None and len(p) == hw for p in payloads]
        good = [p for p, k in zip(payloads, keep) if k]
        out = batch.filter(pa.array(keep)).drop_columns(["payload"])
        if not good:
            return out.append_column("dhash", pa.array([], pa.uint64()))
        px = np.frombuffer(b"".join(good), dtype=np.uint8).reshape(
            len(good), height, width
        )
        bits = (px[:, :, :-1] > px[:, :, 1:]).reshape(len(good), -1)
        packed = np.packbits(bits, axis=1).astype(np.uint64)  # MSB-first bytes
        w8 = (np.uint64(1) << (np.uint64(8) * np.arange(7, -1, -1, dtype=np.uint64)))
        h = (packed * w8).sum(axis=1, dtype=np.uint64)
        return out.append_column("dhash", pa.array(h, pa.uint64()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def phash_dup_pairs(
    ds: ray.data.Dataset,
    max_hamming: int = 3,
    height: int = 8,
    width: int = 9,
    id_col: str = "media_id",
) -> ray.data.Dataset:
    """Perceptual near-duplicate image pairs: dHash fingerprints + 16-bit
    band blocking (any pair within Hamming distance 3 shares one of 4 bands
    by pigeonhole — recall 1 at the default threshold) + exact popcount
    verify.  The image analog of SimHash text dedup, sharing its candidate
    machinery; output ``(media_a, media_b, hamming)`` deduped across bands.

    Scale shape: only ``(band, key, id, hash)`` ints shuffle — pixels never
    leave the fingerprint stage; candidates group per 64-way hash bucket and
    verify vectorized.
    """
    fps = dhash_frames(ds, height, width, id_col=id_col)
    return _banded_hamming_pairs(fps, "dhash", max_hamming, id_col)


def _banded_hamming_pairs(
    fps: ray.data.Dataset, fp_col: str, max_hamming: int, id_col: str
) -> ray.data.Dataset:
    """Shared tail of every 64-bit-fingerprint near-dup operator: 4x16-bit
    band blocking (recall 1 at hamming<=3 by pigeonhole), candidate pairs
    per band bucket, exact popcount verify, cross-band dedup.  Only
    (band, key, id, fp) ints ever shuffle."""
    import pandas as pd

    from ..functions.dedup import bucketed_group_pairs, popcount64
    from ..ops.common import bucketed_distinct

    _U64 = np.uint64
    fps = fps.map_batches(
        lambda b: b.rename_columns(
            ["doc_id" if c == id_col else c for c in b.schema.names]
        ),
        batch_format="pyarrow",
    )

    def explode(batch: pa.Table) -> pa.Table:
        fp = batch[fp_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        bands, keys, out_ids, out_fp = [], [], [], []
        for b in range(4):
            bands.append(np.full(len(fp), b, dtype=np.int32))
            keys.append((fp >> _U64(16 * b)) & _U64(0xFFFF))
            out_ids.append(ids)
            out_fp.append(fp)
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands)),
                "key": pa.array(np.concatenate(keys), pa.uint64()),
                "doc_id": pa.array(np.concatenate(out_ids)),
                fp_col: pa.array(np.concatenate(out_fp), pa.uint64()),
            }
        )

    pairs = bucketed_group_pairs(
        fps.map_batches(explode, batch_format="pyarrow"),
        ["band", "key"],
        carry=(fp_col,),
    )

    def hamming_filter(g: pd.DataFrame) -> pd.DataFrame:
        a = g[f"{fp_col}_a"].to_numpy().astype(np.uint64)
        b = g[f"{fp_col}_b"].to_numpy().astype(np.uint64)
        d = popcount64(a ^ b)
        keep = d <= max_hamming
        out = g.loc[keep, ["doc_a", "doc_b"]].copy()
        out["hamming"] = d[keep].astype(np.int64)
        return out

    pairs = pairs.map_batches(hamming_filter, batch_format="pandas")
    pairs = bucketed_distinct(pairs, ["doc_a", "doc_b"], ["doc_a", "doc_b", "hamming"])
    return pairs.map_batches(
        lambda b: b.select(["doc_a", "doc_b", "hamming"]).rename_columns(
            ["media_a", "media_b", "hamming"]
        ),
        batch_format="pyarrow",
    ).sort(["media_a", "media_b"])


def audio_energy_fingerprint(
    ds: ray.data.Dataset,
    frame_len: int = 32,
    n_frames: int = 65,
    id_col: str = "media_id",
    batch_size: int = 256,
) -> ray.data.Dataset:
    """64-bit AUDIO fingerprint over raw 16-bit PCM — the acoustic sibling
    of :func:`dhash_frames`: the clip is cut into ``n_frames`` frames of
    ``frame_len`` samples, each frame's ENERGY is the exact integer sum of
    absolute sample values, and bit ``k`` (MSB first, ``n_frames - 1 = 64``
    bits) is 1 iff ``energy[k] > energy[k+1]`` — a tempo-invariant
    loudness-contour hash, all integer arithmetic so the SQL oracle
    reproduces it bit-for-bit from the blob.  Rows whose payload isn't
    exactly ``2 * frame_len * n_frames`` bytes are dropped (corrupt-input
    arm)."""
    need = 2 * frame_len * n_frames

    def fn(batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        keep = [p is not None and len(p) == need for p in payloads]
        good = [p for p, k in zip(payloads, keep) if k]
        out = batch.filter(pa.array(keep)).drop_columns(["payload"])
        if not good:
            return out.append_column("afp", pa.array([], pa.uint64()))
        pcm = np.frombuffer(b"".join(good), dtype="<i2").reshape(
            len(good), n_frames, frame_len
        )
        energy = np.abs(pcm.astype(np.int64)).sum(axis=2)
        bits = energy[:, :-1] > energy[:, 1:]
        packed = np.packbits(bits, axis=1).astype(np.uint64)
        w8 = np.uint64(1) << (np.uint64(8) * np.arange(7, -1, -1, dtype=np.uint64))
        h = (packed * w8).sum(axis=1, dtype=np.uint64)
        return out.append_column("afp", pa.array(h, pa.uint64()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def audio_dup_pairs(
    ds: ray.data.Dataset,
    max_hamming: int = 3,
    frame_len: int = 32,
    n_frames: int = 65,
    id_col: str = "media_id",
) -> ray.data.Dataset:
    """Near-duplicate AUDIO pairs by energy-contour fingerprint: same banded
    blocking + exact popcount verify as :func:`phash_dup_pairs` (recall 1
    at hamming<=3), so only fingerprint ints ever shuffle — PCM bytes never
    leave the fingerprint stage."""
    fps = audio_energy_fingerprint(ds, frame_len, n_frames, id_col=id_col)
    return _banded_hamming_pairs(fps, "afp", max_hamming, id_col)
