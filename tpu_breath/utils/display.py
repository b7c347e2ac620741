"""Console status helpers (rich-based with a plain fallback) + parameter
counting — the LX layer of the reference (src/utils/display.py:6-36)."""
from __future__ import annotations

try:
    from rich.console import Console
    _console = Console()

    def _emit(style: str, msg: str) -> None:
        _console.print(msg, style=style)
except Exception:  # pragma: no cover
    def _emit(style: str, msg: str) -> None:
        print(msg)


def print_start(msg):
    _emit("bold cyan", f"▶ {msg}")


def print_success(msg):
    _emit("bold green", f"✔ {msg}")


def print_warning(msg):
    _emit("bold yellow", f"⚠ {msg}")


def print_error(msg):
    _emit("bold red", f"✘ {msg}")


def print_info(msg):
    _emit("dim", f"· {msg}")


def count_parameters(params) -> tuple[int, int]:
    """Total/trainable parameter count for a flax params pytree."""
    import jax
    total = sum(x.size for x in jax.tree.leaves(params))
    print_info(f"parameters: {total:,} total")
    return total, total
