"""Version info and startup banner.

Counterpart of the reference's git-aware version module and ASCII logo
(/root/reference/hamgnn/version.py:19-31, printed from main.py:551-556).
"""

from __future__ import annotations

import os
import subprocess

__version__ = "0.1.0"

_BANNER = r"""
  _  _             ___ _  _ _  _     _____ ___ _   _
 | || |__ _ _ __  / __| \| | \| |___|_   _| _ \ | | |
 | __ / _` | '  \| (_ | .` | .` |___| | | |  _/ |_| |
 |_||_\__,_|_|_|_|\___|_|\_|_|\_|      |_| |_|  \___/
"""


def git_revision() -> str:
    """Short git hash of the installed tree, or '' outside a checkout."""
    try:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = subprocess.run(
            ["git", "-C", root, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5)
        return out.stdout.strip() if out.returncode == 0 else ""
    except Exception:
        return ""


def version_string() -> str:
    rev = git_revision()
    return f"hamgnn_tpu {__version__}" + (f" (git {rev})" if rev else "")


def print_banner() -> None:
    print(_BANNER)
    print(version_string())
