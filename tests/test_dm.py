"""Acquisition front end: DM4 reading, Stage-Alpha angles, SFTP streaming.

Covers the reference's microscope-facing path (cpu/utils/logger.py):
.dm4 micrograph reading (:87-93, via tomojax.dm instead of ncempy),
tilt angle from the DM `.Stage Alpha` metadata tag (:177-181), and
remote SFTP monitoring with local mirroring (:140-176, faked client).
"""

import os

import numpy as np
import pytest

from tomojax import dm
from tomojax.stream import SftpMirror, TiltWatcher, dm_angle


@pytest.fixture
def img():
    rng = np.random.default_rng(0)
    return (rng.random((48, 40)) + 1.0).astype(np.float32)


def test_dm4_roundtrip(img, tmp_path):
    path = str(tmp_path / "t.dm4")
    dm.write_dm4(path, img, stage_alpha=-42.5)
    out = dm.read_dm(path)
    assert np.array_equal(out["data"], img)
    assert out["stage_alpha"] == -42.5
    # the reference's exact tag path resolves (thumbnail at ImageList.1)
    assert (
        out["tags"][
            ".ImageList.2.ImageTags.Microscope Info.Stage Position"
            ".Stage Alpha"
        ]
        == -42.5
    )


def test_dm4_no_thumbnail_fallback(img, tmp_path):
    """Files without a thumbnail index the image at ImageList.1; the
    reader and the Stage-Alpha suffix search both fall back."""
    path = str(tmp_path / "t.dm4")
    dm.write_dm4(path, img, stage_alpha=13.25, thumbnail=False)
    out = dm.read_dm(path)
    assert np.array_equal(out["data"], img)
    assert out["stage_alpha"] == 13.25


def test_dm_angle_filename_fallback(img, tmp_path):
    """Micrographs without stage metadata fall back to filename angles."""
    path = str(tmp_path / "tilt_-12.0.dm4")
    dm.write_dm4(path, img)
    assert dm.stage_alpha(dm.read_tags(path)) is None
    assert dm_angle(path) == -12.0


def test_dm4_rejects_non_dm(tmp_path):
    path = str(tmp_path / "x.dm4")
    with open(path, "wb") as f:
        f.write(b"\x00" * 64)
    with pytest.raises(ValueError):
        dm.read_tags(path)


def test_tiltwatcher_dm4(img, tmp_path):
    """End-to-end: a directory of .dm4 micrographs streams through
    TiltWatcher with DM-metadata angles (no filename angles present)."""
    for i, ang in enumerate((-30.0, 0.0, 30.0)):
        dm.write_dm4(
            str(tmp_path / f"frame_{i:03d}.dm4"),
            img + i,
            stage_alpha=ang,
        )
    w = TiltWatcher(str(tmp_path), extension=".dm4", preprocess=False)
    new = w.poll()
    assert [a for a, _ in new] == [-30.0, 0.0, 30.0]
    assert np.array_equal(new[0][1], img)
    assert w.poll() == []  # nothing new


class FakeSftp:
    """Duck-typed paramiko SFTPClient: serves files from a dict that the
    test grows over time (a faked remote acquisition run)."""

    def __init__(self):
        self.files = {}

    def listdir(self):
        return list(self.files)

    def get(self, name, local):
        with open(local, "wb") as f:
            f.write(self.files[name])


def _dm4_bytes(img, ang, tmp_path, name):
    p = str(tmp_path / ("src_" + name))
    dm.write_dm4(p, img, stage_alpha=ang)
    with open(p, "rb") as f:
        return f.read()


def test_sftp_streaming_run(img, tmp_path):
    """A faked remote acquisition: files appear on the 'server' between
    polls; the watcher mirrors them locally and streams angle+image
    pairs (reference monitor_online, logger.py:140-163)."""
    remote = FakeSftp()
    local = tmp_path / "mirror"
    w = TiltWatcher(
        str(local), extension=".dm4", preprocess=False, sftp_client=remote
    )
    assert w.poll() == []  # empty acquisition so far

    remote.files["a_000.dm4"] = _dm4_bytes(img, -60.0, tmp_path, "a.dm4")
    new = w.poll()
    assert [a for a, _ in new] == [-60.0]
    assert os.path.exists(local / "a_000.dm4")  # mirrored locally

    remote.files["b_001.dm4"] = _dm4_bytes(img + 1, -57.0, tmp_path, "b.dm4")
    remote.files["c_002.dm4"] = _dm4_bytes(img + 2, -54.0, tmp_path, "c.dm4")
    new = w.poll()
    assert [a for a, _ in new] == [-57.0, -54.0]
    assert w.angles == [-60.0, -57.0, -54.0]
    assert w.poll() == []


def test_sftp_url_parsing(tmp_path):
    """TiltWatcher(remote='sftp://...') wires credentials through
    SftpMirror.from_url; the injected client skips the paramiko dial."""
    client = FakeSftp()
    m = SftpMirror.from_url(
        "sftp://user:pw@scope.lab:2222/data/run1",
        str(tmp_path / "loc"),
        client=client,
    )
    assert m.remote_dir == "/data/run1"
    assert m.sync(".dm4") == []


def test_sftp_vanished_file_retry(img, tmp_path):
    """A file that fails to download is retried on the next poll
    (acquisition writes are not atomic)."""

    class Flaky(FakeSftp):
        def __init__(self):
            super().__init__()
            self.fail = set()

        def get(self, name, local):
            if name in self.fail:
                raise OSError("incomplete")
            super().get(name, local)

    remote = Flaky()
    remote.files["a_000.dm4"] = _dm4_bytes(img, 5.0, tmp_path, "a.dm4")
    remote.fail.add("a_000.dm4")
    w = TiltWatcher(
        str(tmp_path / "m"), extension=".dm4", preprocess=False,
        sftp_client=remote,
    )
    assert w.poll() == []
    remote.fail.clear()
    assert [a for a, _ in w.poll()] == [5.0]
