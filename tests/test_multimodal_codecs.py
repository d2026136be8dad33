"""Real-codec arms behind import gates: the stdlib WAV decode runs
everywhere; the PIL image arm and the xarray ECMWF arm run where those
libraries exist and assert plumbing parity with the sandbox fakes."""

import io
import struct
import wave

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from core_ray.stages.multimodal import (
    BinaryDecodeStage,
    audio_frame_features,
    decode_binary_column,
    decode_wav_column,
)

try:
    import PIL  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

try:
    import xarray  # noqa: F401

    HAS_XARRAY = True
except ImportError:
    HAS_XARRAY = False


def _wav_bytes(samples: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_decode_wav_real_kernel_roundtrip():
    rng = np.random.default_rng(3)
    s0 = (rng.integers(-30000, 30000, 4096)).astype(np.int16)
    s1 = (np.sin(np.arange(2048) * 0.1) * 16384).astype(np.int16)
    ds = ray.data.from_items(
        [
            {"media_id": 0, "payload": _wav_bytes(s0)},
            {"media_id": 1, "payload": _wav_bytes(s1, rate=16000)},
            {"media_id": 2, "payload": b"not a wav at all"},  # dropped
        ]
    )
    out = decode_wav_column(ds).to_pandas().sort_values("media_id")
    assert out["media_id"].tolist() == [0, 1]
    assert out["sample_rate"].tolist() == [8000, 16000]
    assert out["channels"].tolist() == [1, 1]
    got0 = np.frombuffer(out["payload"].iloc[0], dtype="<i2")
    assert (got0 == s0).all()  # decode is exact, not approximate


def test_decoded_wav_feeds_audio_features():
    # constant-amplitude square wave: RMS == amplitude exactly
    amp = 8192
    sq = np.tile(np.array([amp, -amp], np.int16), 8192)
    ds = ray.data.from_items([{"media_id": 0, "payload": _wav_bytes(sq)}])
    feats = audio_frame_features(
        decode_wav_column(ds), frame_len=1024, n_frames=16
    ).to_pandas()
    rms = np.asarray(feats["rms"].iloc[0])
    assert rms.shape == (16,)
    np.testing.assert_allclose(rms, amp / 32768.0, rtol=1e-12)


def test_image_decode_import_gate_and_parity():
    rows = [
        {"media_id": i, "payload": bytes([i] * 256)} for i in range(4)
    ]
    fake = decode_binary_column(
        ray.data.from_items(rows), feature_dim=8, concurrency=1
    ).to_pandas()
    assert len(fake) == 4
    assert np.asarray(fake["features"].iloc[0]).shape == (8,)

    if not HAS_PIL:
        with pytest.raises(ImportError, match="Pillow"):
            BinaryDecodeStage(feature_dim=8, fake=False)
        return

    # PIL present: the real arm must be plumbing-identical to the fake arm
    from PIL import Image  # pragma: no cover - PIL absent in sandbox

    def png(i):
        img = Image.fromarray(
            (np.arange(64, dtype=np.uint8).reshape(8, 8) + i)
        )
        b = io.BytesIO()
        img.save(b, format="PNG")
        return b.getvalue()

    real_rows = [{"media_id": i, "payload": png(i)} for i in range(4)]
    real = decode_binary_column(
        ray.data.from_items(real_rows), feature_dim=8, concurrency=1,
        fake=False,
    ).to_pandas()
    assert list(real.columns) == list(fake.columns)
    v = np.asarray(real["features"].iloc[0])
    assert v.shape == (8,) and (0.0 <= v).all() and (v <= 1.0).all()


@pytest.mark.skipif(not HAS_XARRAY, reason="xarray absent in this sandbox")
def test_ecmwf_xarray_arm_parity(tmp_path):  # pragma: no cover - gated
    import pandas as pd
    import xarray as xr

    from core_ray.stages.ecmwf import ecmwf_extract_point, fake_grid_loader

    lats = np.linspace(40.0, 44.0, 5)
    lons = np.linspace(-4.0, 0.0, 5)
    times = pd.date_range("2024-01-01", periods=4, freq="h")
    rng = np.random.default_rng(11)
    for run in ("2024-01-01_00", "2024-01-01_12"):
        cube = xr.Dataset(
            {
                "u10": (("time", "latitude", "longitude"),
                        rng.normal(size=(4, 5, 5))),
                "2t": (("time", "latitude", "longitude"),
                       rng.normal(size=(4, 5, 5))),
            },
            coords={"time": times, "latitude": lats, "longitude": lons},
        )
        cube.to_netcdf(tmp_path / f"{run}.nc")

    kw = dict(
        load_path=str(tmp_path),
        date_start="2024-01-01 00:00:00",
        date_end="2024-01-01 23:00:00",
        run_interval="12",
        run_frequency="H",
        variables=["10u", "2t"],
        tag_prefix="fc_",
        concurrency=1,
    )
    real = ecmwf_extract_point(lat=41.0, lon=-2.0, loader=None, **kw).to_pandas()
    fake = ecmwf_extract_point(
        lat=41.0, lon=-2.0, loader=fake_grid_loader(), **kw
    ).to_pandas()
    # plumbing parity: identical schema, row count, tag/timestamp layout
    assert list(real.columns) == list(fake.columns)
    assert len(real) == len(fake)
    assert set(real["TagName"]) == set(fake["TagName"])


def test_dhash_frames_bit_order_and_corrupt_drop():
    """Bit k = r*8+c (MSB first) is 1 iff px[r,c] > px[r,c+1]: a frame whose
    only descending neighbor pair is at (0,0) hashes to exactly 2^63; a
    wrong-length payload is dropped."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from core_ray.stages.multimodal import dhash_frames

    frame = np.zeros((8, 9), dtype=np.uint8)
    frame[0, 0] = 5  # px[0,0] > px[0,1] -> bit 0 (MSB) set, nothing else
    asc = np.tile(np.arange(9, dtype=np.uint8), (8, 1))  # strictly ascending rows
    t = pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array(
                [frame.tobytes(), asc.tobytes(), b"\x00" * 5], pa.binary()
            ),
        }
    )
    out = dhash_frames(ray.data.from_arrow(t)).to_pandas().sort_values("media_id")
    assert list(out["media_id"]) == [1, 2]
    assert int(out["dhash"].iloc[0]) == 1 << 63
    assert int(out["dhash"].iloc[1]) == 0


def test_phash_dup_pairs_hand_case():
    """Two copies + a 1-pixel perturbation pair at hamming<=2; an inverted
    frame is far from all and emits no pair."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from core_ray.stages.multimodal import phash_dup_pairs

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, size=72, dtype=np.uint8)
    pert = base.copy()
    pert[10] = min(255, int(pert[10]) + 50)
    far = 255 - base
    t = pa.table(
        {
            "media_id": pa.array([0, 1, 2, 3], pa.int64()),
            "payload": pa.array(
                [base.tobytes(), base.tobytes(), pert.tobytes(), far.tobytes()],
                pa.binary(),
            ),
        }
    )
    out = phash_dup_pairs(ray.data.from_arrow(t), max_hamming=3).to_pandas()
    pairs = {(int(r.media_a), int(r.media_b)): int(r.hamming) for r in out.itertuples()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 2
    assert all(3 not in p for p in pairs)


def test_audio_fingerprint_bit_order_and_pairs():
    """Rising-energy clip hashes to 0; one emphatic frame flips exactly the
    adjacent contour bits; corrupt payload dropped; near-dup pairs found."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from core_ray.stages.multimodal import audio_dup_pairs, audio_energy_fingerprint

    fl, nf = 32, 65
    base = np.repeat(np.arange(nf) * 10, fl).astype("<i2")  # rising energy
    twin = base.copy()
    twin[5 * fl] += 30  # tiny nudge: energy order mostly intact
    noise = np.random.default_rng(2).integers(-5000, 5000, nf * fl).astype("<i2")
    t = pa.table(
        {
            "media_id": pa.array([0, 1, 2, 3], pa.int64()),
            "payload": pa.array(
                [base.tobytes(), twin.tobytes(), noise.tobytes(), b"xx"],
                pa.binary(),
            ),
        }
    )
    fp = audio_energy_fingerprint(ray.data.from_arrow(t)).to_pandas()
    assert fp["media_id"].tolist() == [0, 1, 2]  # corrupt row dropped
    assert int(fp.loc[0, "afp"]) == 0  # strictly rising: no bit set
    pairs = audio_dup_pairs(ray.data.from_arrow(t), max_hamming=3).to_pandas()
    got = {(int(r.media_a), int(r.media_b)) for r in pairs.itertuples()}
    assert (0, 1) in got
    assert all(2 not in p for p in got)
