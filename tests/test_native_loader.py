"""Native C++ data-loader (native/rso_loader.cpp) vs host Python decode.

The reference's acquisition layer is native C++ (MRPT CCameraSensor /
rawlog / CImage, demo-main.cpp:110-146); ours is the libpng/libjpeg/PGM
decoder + prefetch ring.  Tests follow the repo's cross-language
equivalence pattern: the native decode must match the cv2/PIL host path
bit-for-bit (or within codec rounding), and the multi-threaded ring must
deliver frames strictly in order with bounded memory.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from rso.io import native_loader as nl
from rso.io.datasets import StereoDataset, load_image_dir

pytestmark = pytest.mark.skipif(
    not nl.available(), reason="native loader library not built")


@pytest.fixture(scope="module")
def mrng():
    return np.random.default_rng(42)


def test_decode_gray_png_exact(tmp_path, mrng):
    g = mrng.integers(0, 255, (48, 64), np.uint8)
    p = str(tmp_path / "g.png")
    cv2.imwrite(p, g)
    assert np.array_equal(nl.decode_gray(p), g)


def test_decode_color_png_matches_cv2_bt601(tmp_path, mrng):
    c = mrng.integers(0, 255, (48, 64, 3), np.uint8)
    p = str(tmp_path / "c.png")
    cv2.imwrite(p, c)
    ref = cv2.cvtColor(c, cv2.COLOR_BGR2GRAY).astype(int)
    got = nl.decode_gray(p).astype(int)
    assert np.abs(got - ref).max() <= 1


def test_decode_jpeg_matches_cv2(tmp_path, mrng):
    for shape in [(48, 64), (48, 64, 3)]:
        img = mrng.integers(0, 255, shape, np.uint8)
        p = str(tmp_path / f"j{len(shape)}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        ref = cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(int)
        got = nl.decode_gray(p).astype(int)
        # both sides run libjpeg; allow 1 count of IDCT rounding skew
        assert np.abs(got - ref).max() <= 1


def test_decode_pgm_variants(tmp_path, mrng):
    g = mrng.integers(0, 255, (32, 40), np.uint8)
    p5 = tmp_path / "g.pgm"
    p5.write_bytes(b"P5\n# comment line\n40 32\n255\n" + g.tobytes())
    assert np.array_equal(nl.decode_gray(str(p5)), g)
    p2 = tmp_path / "g2.pgm"
    p2.write_text("P2\n40 32\n255\n" + " ".join(map(str, g.flatten())))
    assert np.array_equal(nl.decode_gray(str(p2)), g)
    g16 = mrng.integers(0, 65535, (16, 20)).astype(np.uint16)
    p16 = tmp_path / "g16.pgm"
    p16.write_bytes(b"P5\n20 16\n65535\n" + g16.byteswap().tobytes())
    assert np.array_equal(nl.decode_gray(str(p16)),
                          (g16 >> 8).astype(np.uint8))


def test_probe_and_errors(tmp_path, mrng):
    g = mrng.integers(0, 255, (48, 64), np.uint8)
    p = str(tmp_path / "g.png")
    cv2.imwrite(p, g)
    assert nl.probe_image(p) == (48, 64)
    with pytest.raises(RuntimeError):
        nl.decode_gray(str(tmp_path / "missing.png"))
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"\x89PNG garbage")
    with pytest.raises(RuntimeError):
        nl.decode_gray(str(bad))


def _write_seq(tmp_path, mrng, n=16, h=48, w=64):
    frames = []
    for i in range(n):
        L = mrng.integers(0, 255, (h, w), np.uint8)
        R = mrng.integers(0, 255, (h, w), np.uint8)
        cv2.imwrite(str(tmp_path / f"left_{i:03d}.png"), L)
        cv2.imwrite(str(tmp_path / f"right_{i:03d}.png"), R)
        frames.append((L, R))
    lp = [str(tmp_path / f"left_{i:03d}.png") for i in range(n)]
    rp = [str(tmp_path / f"right_{i:03d}.png") for i in range(n)]
    return lp, rp, frames


def test_prefetch_ring_in_order(tmp_path, mrng):
    lp, rp, frames = _write_seq(tmp_path, mrng)
    ring = nl.NativePrefetcher(lp, rp, depth=3, n_threads=3)
    assert (ring.height, ring.width) == (48, 64)
    seen = 0
    for L, R, idx in ring:
        assert idx == seen
        assert np.array_equal(L, frames[idx][0])
        assert np.array_equal(R, frames[idx][1])
        seen += 1
    assert seen == len(frames)


def test_prefetch_ring_error_propagates(tmp_path, mrng):
    lp, rp, _ = _write_seq(tmp_path, mrng, n=10)
    with open(lp[5], "wb") as f:
        f.write(b"\x89PNG garbage")
    ring = nl.NativePrefetcher(lp, rp, depth=4, n_threads=2)
    with pytest.raises(RuntimeError, match="frame 5"):
        for _ in ring:
            pass


def test_dataset_prefetch_native_matches_python(tmp_path, mrng):
    from rso.geometry.stereo_camera import StereoCamera

    lp, rp, frames = _write_seq(tmp_path, mrng, n=8)
    cam = StereoCamera.make(fx_l=100.0, fy_l=100.0, cx_l=32.0, cy_l=24.0,
                            baseline=0.3)
    ds = load_image_dir(str(tmp_path), cam)
    nat = list(ds.prefetch(native=True))
    py = list(ds.prefetch(native=False))
    assert len(nat) == len(py) == 8
    for a, b in zip(nat, py):
        assert a.index == b.index and a.timestamp == b.timestamp
        assert np.array_equal(a.left, b.left)
        assert np.array_equal(a.right, b.right)


def test_prefetch_early_close_no_hang(tmp_path, mrng):
    lp, rp, _ = _write_seq(tmp_path, mrng, n=12)
    ring = nl.NativePrefetcher(lp, rp, depth=3, n_threads=2)
    it = iter(ring)
    next(it)
    next(it)
    ring.close()  # workers blocked on the ring must unblock and join
