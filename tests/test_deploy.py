"""--py-files packaging: the engine must import from the zip ALONE.

Simulates what spark-submit --py-files does on an executor: put engine.zip
on sys.path of a fresh interpreter whose cwd / PYTHONPATH contain no repo
checkout, import the package, and run a kernel.  Catches accidental
test-only imports, data-file dependencies, and non-package modules leaking
into the engine's import graph.
"""

import os
import subprocess
import sys
import zipfile

from engine.deploy import artifact_sha256, make_pyfiles_zip, submit_command

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_zip_is_deterministic(tmp_path):
    a = make_pyfiles_zip(str(tmp_path / "a.zip"))
    b = make_pyfiles_zip(str(tmp_path / "b.zip"))
    assert artifact_sha256(a) == artifact_sha256(b)
    names = zipfile.ZipFile(a).namelist()
    assert "engine/__init__.py" in names
    assert all(n.startswith("engine/") and n.endswith(".py") for n in names)
    # nothing but source ships
    assert not any("test" in n for n in names)


def test_engine_imports_from_zip_alone(tmp_path):
    """Fresh interpreter, sys.path = [zip] + stdlib/site — no repo dir."""
    zp = make_pyfiles_zip(str(tmp_path / "engine.zip"))
    probe = (
        "import sys; sys.path.insert(0, %r); "
        "import engine, engine.tiles, engine.joins, engine.geom, engine.tiff; "
        "import numpy as np; "
        "tx, ty = engine.tiles.lonlat_to_tile(np.array([2.35]), np.array([48.85]), 5); "
        "assert (int(tx[0]), int(ty[0])) == (16, 20), (tx, ty); "  # TMS y (from south)
        "print('ZIPOK', engine.__name__)"
    ) % zp
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [sys.executable, "-c", probe],
        capture_output=True, text=True, cwd=str(tmp_path), env=env, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ZIPOK engine" in r.stdout


def test_no_module_imports_tests_or_entry():
    """The engine package must not depend on the repo layout (tests/,
    __spark_entry__) — those never ship in --py-files."""
    import re

    eng = os.path.join(REPO, "engine")
    bad = re.compile(r"^\s*(import|from)\s+(tests|__spark_entry__)\b", re.M)
    for name in sorted(os.listdir(eng)):
        if name.endswith(".py"):
            src = open(os.path.join(eng, name)).read()
            assert not bad.search(src), f"engine/{name} imports repo-layout module"


def test_submit_command_shape():
    cmd = submit_command("job.py", executors=1000, conf={"spark.sql.shuffle.partitions": "4000"})
    assert cmd[0] == "spark-submit" and cmd[-1] == "job.py"
    assert "--py-files" in cmd and "--num-executors" in cmd
    assert "spark.sql.shuffle.partitions=4000" in cmd
