"""
String helpers (slugs, human-readable durations/sizes).

Capability parity with reference ``util/string_util.py`` (safe_name,
human_duration, human_size) — the slug convention matters because feature
caches are keyed by ``safe_name(phrase)``.
"""

from __future__ import annotations

import re

__all__ = ["safe_name", "human_duration", "human_size"]

_SLUG_STRIP = re.compile(r"[^a-z0-9]+")


def safe_name(text: str) -> str:
    """
    Turn arbitrary text into a filesystem-safe slug.

    >>> safe_name("Hello, World!")
    'hello-world'
    >>> safe_name("  hey   buddy  ")
    'hey-buddy'
    """
    slug = _SLUG_STRIP.sub("-", text.strip().lower())
    return slug.strip("-")


def human_duration(seconds: float) -> str:
    """
    Format a duration in seconds as a human-readable string.

    >>> human_duration(0.5)
    '500ms'
    >>> human_duration(90)
    '1m 30s'
    >>> human_duration(3725)
    '1h 2m 5s'
    """
    if seconds < 1:
        return f"{seconds * 1000:.0f}ms"
    seconds = int(round(seconds))
    hours, rem = divmod(seconds, 3600)
    minutes, secs = divmod(rem, 60)
    parts = []
    if hours:
        parts.append(f"{hours}h")
    if minutes:
        parts.append(f"{minutes}m")
    if secs or not parts:
        parts.append(f"{secs}s")
    return " ".join(parts)


def human_size(num_bytes: float) -> str:
    """
    Format a byte count as a human-readable string.

    >>> human_size(512)
    '512B'
    >>> human_size(2048)
    '2.0KB'
    >>> human_size(5 * 1024 ** 3)
    '5.0GB'
    """
    size = float(num_bytes)
    for unit in ["B", "KB", "MB", "GB", "TB", "PB"]:
        if abs(size) < 1024.0 or unit == "PB":
            if unit == "B":
                return f"{int(size)}B"
            return f"{size:.1f}{unit}"
        size /= 1024.0
    return f"{size:.1f}PB"
