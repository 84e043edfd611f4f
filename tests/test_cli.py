"""CLI surface (go_raytracer_tpu.cli): the reference binary's flag set
(main.go:416-480) plus the TPU-era extensions, exercised end-to-end in
subprocesses (the CLI owns platform selection, so in-process calls would
fight the session's jax config)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def run_cli(args, timeout=420):
    return subprocess.run(
        [sys.executable, "-m", "go_raytracer_tpu", *args],
        capture_output=True, text=True, timeout=timeout, env=_ENV,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_unknown_scene_exits_2_with_listing():
    """Deliberate divergence from the reference (whose defaultScene stub
    silently writes a zero-byte file, main.go:411-413): unknown -S must
    fail loudly and name the valid scenes."""
    r = run_cli(["-S", "99", "-o", "/tmp/cli_unknown.png", "--cpu"])
    assert r.returncode == 2
    msg = r.stderr + r.stdout
    assert "cornellBox" in msg


def test_render_ppm_and_stats(tmp_path):
    """-S/-o/--stats end-to-end: a tiny cornell render writes a valid P3
    PPM (color.go:23-46 output format) and one JSON stats line."""
    out = tmp_path / "img.ppm"
    r = run_cli(["-S", "6", "-o", str(out), "--cpu", "--width", "24",
                 "--spp", "4", "--max-depth", "3", "--lanes", "2048",
                 "--stats", "--quiet"])
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["paths"] == 24 * 24 * 4
    assert stats["segments"] >= stats["paths"]
    txt = out.read_text().split()
    assert txt[0] == "P3"
    w, h, maxv = int(txt[1]), int(txt[2]), int(txt[3])
    assert (w, h, maxv) == (24, 24, 255)
    vals = np.asarray(txt[4:], dtype=np.int64)
    assert vals.size == w * h * 3
    assert vals.min() >= 0 and vals.max() <= 255


def test_wavefront_integrator_and_seed(tmp_path):
    """--integrator wavefront + --seed: same seed reproduces the image
    bit-for-bit; a different seed does not."""
    outs = []
    for seed in (3, 3, 4):
        out = tmp_path / f"s{seed}_{len(outs)}.ppm"
        r = run_cli(["-S", "4", "-o", str(out), "--cpu", "--width", "16",
                     "--spp", "4", "--max-depth", "3",
                     "--integrator", "wavefront", "--batch", "2048",
                     "--seed", str(seed), "--quiet"])
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(out.read_text())
    assert outs[0] == outs[1]
    assert outs[0] != outs[2]
