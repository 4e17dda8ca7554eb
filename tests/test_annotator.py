"""Native annotator smoke test (SURVEY.md §2.10).

Runs the C++ annotator's --selfcheck, which covers: fixed crop-window sizes
from the target ratio for both benchmark ratios (reference
``frmMain.cs:81-100``), the annotation text-format round trip
(``frmMain.cs:278-343``), the mouse-up gap interpolation
(``frmMain.cs:505-558``), and the non-interactive save path.

Fast tier: uses the committed binary when it is newer than the source,
rebuilding via make only when needed (and skipping when no toolchain).
"""

import pathlib
import shutil
import subprocess

import pytest

ANNOTATOR_DIR = pathlib.Path(__file__).resolve().parent.parent / \
    'tools' / 'annotator'


def test_annotator_selfcheck():
    binary = ANNOTATOR_DIR / 'annotator'
    source = ANNOTATOR_DIR / 'annotator.cpp'
    stale = (not binary.is_file()
             or binary.stat().st_mtime < source.stat().st_mtime)
    if stale:
        if shutil.which('make') is None or shutil.which('g++') is None:
            pytest.skip('no C++ toolchain to rebuild a stale annotator')
        build = subprocess.run(['make', '-C', str(ANNOTATOR_DIR)],
                               capture_output=True, text=True, timeout=300)
        assert build.returncode == 0, build.stderr

    proc = subprocess.run([str(binary), '--selfcheck'],
                          capture_output=True, text=True, timeout=60,
                          stdin=subprocess.DEVNULL)
    assert proc.returncode == 0, proc.stderr
    assert 'selfcheck ok' in proc.stdout
