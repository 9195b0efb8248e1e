"""I/O round-trip tests: reference-layout HDF5 results, checkpoint/resume,
and sharded orbax checkpoints."""

import numpy as np
import jax
import jax.numpy as jnp

from tomojax import io, dist


def test_results_roundtrip(tmp_path):
    recon = np.random.default_rng(0).uniform(0, 1, (4, 8, 8)).astype(np.float32)
    meta = {"alg": "sirt", "Niter": 10, "beta": 0.5}
    results = {"dd": np.arange(5, dtype=np.float32), "tv": np.ones(5, np.float32)}
    p = str(tmp_path / "res.h5")
    io.save_results(p, meta, results, recon)
    r2, res2, par2 = io.load_results(p)
    np.testing.assert_allclose(r2, recon)
    np.testing.assert_allclose(res2["dd"], results["dd"])
    assert par2["alg"] == "sirt" and par2["Niter"] == 10


def test_h5_tilt_series_roundtrip(tmp_path):
    import h5py

    series = np.random.default_rng(1).uniform(0, 1, (3, 8, 5)).astype(np.float32)
    angles = np.linspace(-60, 60, 5)
    p = str(tmp_path / "ts.h5")
    with h5py.File(p, "w") as f:
        f["tiltSeries"] = series
        f["tiltAngles"] = angles
    s2, a2 = io.load_h5_data(p)
    np.testing.assert_allclose(s2, series)
    np.testing.assert_allclose(a2, angles)


def test_checkpoint_resume(tmp_path):
    recon = np.ones((2, 4, 4), np.float32)
    hist = {"dd": np.asarray([3.0, 2.0, 1.0], np.float32)}
    p = str(tmp_path / "ckpt.h5")
    io.save_checkpoint(p, recon, hist, {"Niter": 3})
    r, h, meta = io.load_checkpoint(p)
    np.testing.assert_allclose(r, recon)
    np.testing.assert_allclose(h["dd"], hist["dd"])
    assert meta["Niter"] == 3


def test_sharded_checkpoint(tmp_path):
    mesh = dist.make_mesh(8)
    x = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (16, 8, 8)), jnp.float32
    )
    xs = dist.shard_volume(x, mesh)
    tree = {"recon": xs, "t": jnp.float32(3.0)}
    d = str(tmp_path / "sharded")
    io.save_sharded(d, tree)
    back = io.load_sharded(d, tree)
    np.testing.assert_allclose(np.asarray(back["recon"]), np.asarray(x))
    assert back["recon"].sharding.is_equivalent_to(xs.sharding, 3)
    assert float(back["t"]) == 3.0


def test_tiff_and_npy_loader(tmp_path):
    arr = np.random.default_rng(3).uniform(0, 1, (4, 8, 8)).astype(np.float32)
    pn = str(tmp_path / "x.npy")
    np.save(pn, arr)
    np.testing.assert_allclose(io.load_tilt_series(pn), arr)

    from PIL import Image

    frames = [Image.fromarray((arr[i] * 255).astype(np.uint8)) for i in range(4)]
    pt = str(tmp_path / "x.tiff")
    frames[0].save(pt, save_all=True, append_images=frames[1:])
    t = io.load_tilt_series(pt)
    assert t.shape == (8, 8, 4)  # (z,y,x) -> swapaxes(0,2)
