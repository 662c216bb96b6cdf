"""
Browser distribution bundle (reference parity: webpack UMD bundle +
worklet bundle, src/ts/webpack.config.js / worklet.config.js).

No JS runtime exists in this image, so validation is structural: the build
runs, module syntax is fully erased, every public class is present, the UMD
wrapper is intact, and delimiters stay balanced under a string/comment-aware
scan (catches bad concatenation or over-aggressive stripping).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def dist(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dist"))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "build_browser_bundle.py"), "--out", out],
        check=True,
        capture_output=True,
    )
    return out


def _balanced(source: str) -> bool:
    """Delimiter balance ignoring strings, template literals and comments."""
    pairs = {"}": "{", ")": "(", "]": "["}
    stack = []
    i, n = 0, len(source)
    mode = None  # None | "'" | '"' | "`" | "//" | "/*"
    while i < n:
        ch = source[i]
        nxt = source[i + 1] if i + 1 < n else ""
        if mode in ("'", '"', "`"):
            if ch == "\\":
                i += 2
                continue
            if ch == mode:
                mode = None
        elif mode == "//":
            if ch == "\n":
                mode = None
        elif mode == "/*":
            if ch == "*" and nxt == "/":
                mode = None
                i += 1
        else:
            if ch in ("'", '"', "`"):
                mode = ch
            elif ch == "/" and nxt == "/":
                mode = "//"
                i += 1
            elif ch == "/" and nxt == "*":
                mode = "/*"
                i += 1
            elif ch in "{([":
                stack.append(ch)
            elif ch in ")}]":
                if not stack or stack.pop() != pairs[ch]:
                    return False
        i += 1
    return not stack and mode in (None, "//")


def test_bundle_builds_all_artifacts(dist):
    for name in ("hey-buddy.js", "hey-buddy.min.js", "worklet.min.js", "hey-buddy.d.ts"):
        path = os.path.join(dist, name)
        assert os.path.exists(path) and os.path.getsize(path) > 500, name


def test_umd_wrapper_and_exports(dist):
    with open(os.path.join(dist, "hey-buddy.js")) as f:
        bundle = f.read()
    assert "module.exports = factory()" in bundle
    assert "define([], factory)" in bundle
    assert "root.HeyBuddy = factory()" in bundle
    for cls in ("class HeyBuddy", "class AudioBatcher", "class OnnxModel",
                "class MelSpectrogram", "class SpeechEmbedding", "class EnergyVAD",
                "class SileroVAD", "class WakeWord", "class MutexLock"):
        assert cls in bundle, cls
    for attached in ("HeyBuddy.SileroVAD = SileroVAD", "HeyBuddy.AudioBatcher = AudioBatcher",
                     "HeyBuddy.MutexLock = MutexLock"):
        assert attached in bundle, attached


def test_mutex_semantics_structural():
    """No JS engine in-image: check the mutex contract structurally — FIFO
    waiter queue, idempotent release, exception-safe runExclusive."""
    with open(os.path.join(REPO, "browser", "src", "mutex.js")) as f:
        src = f.read()
    assert "_waiters.push(grant)" in src          # queued when held
    assert "_waiters.shift()" in src              # FIFO handoff
    assert "if (released) return;" in src         # idempotent release
    assert "finally {" in src and "release();" in src  # runExclusive never leaks


def test_module_syntax_fully_erased(dist):
    import re

    with open(os.path.join(dist, "hey-buddy.min.js")) as f:
        bundle = f.read()
    assert not re.search(r"^\s*import\s+.*from", bundle, re.MULTILINE)
    assert not re.search(r"^\s*export\s+(class|function|const|default)", bundle, re.MULTILINE)


def test_bundles_are_balanced(dist):
    for name in ("hey-buddy.js", "hey-buddy.min.js", "worklet.min.js"):
        with open(os.path.join(dist, name)) as f:
            assert _balanced(f.read()), f"{name} has unbalanced delimiters"


def test_silero_vad_reference_hysteresis_defaults():
    """The JS SileroVAD ships the reference thresholds (vad.ts:108-141)."""
    with open(os.path.join(REPO, "browser", "src", "models.js")) as f:
        src = f.read()
    assert "positiveThreshold ?? 0.65" in src
    assert "negativeThreshold ?? 0.4" in src
    assert "silentFramesToStop ?? 8" in src
    # both Silero layouts handled
    assert 'names.includes("state")' in src
