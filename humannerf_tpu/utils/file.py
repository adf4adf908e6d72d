"""File helpers (reference core/utils/file_util.py:3-18)."""

from __future__ import annotations

import os


def list_files(directory: str, exts=None) -> list[str]:
    """Sorted file paths under `directory` filtered by extensions."""
    out = []
    for name in sorted(os.listdir(directory)):
        path = os.path.join(directory, name)
        if not os.path.isfile(path):
            continue
        if exts is None or os.path.splitext(name)[1] in exts:
            out.append(path)
    return out


def split_path(path: str):
    """-> (dirname, stem, ext)."""
    dirname, base = os.path.split(path)
    stem, ext = os.path.splitext(base)
    return dirname, stem, ext
