"""Named-section wall timer (reference ``Tools::Timer``, ``Timer.h:32-89``).

Sections accumulate over repeats and pretty-print at exit.  The reference
synchronizes ranks with ``MPI_Barrier`` at start/stop; here we synchronize
the device instead (``block_until_ready`` on a tiny token) so sections
bound actual device work, not dispatch time.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from typing import Dict, List, Optional


class Timer:
    def __init__(self, sync_device: bool = False):
        self._sections: "OrderedDict[str, List[float]]" = OrderedDict()
        self._open: Dict[str, float] = {}
        self._sync = sync_device

    def _barrier(self):
        if self._sync:
            import jax
            import jax.numpy as jnp

            jnp.zeros(()).block_until_ready()

    def start(self, name: str) -> None:
        self._barrier()
        self._open[name] = time.time()

    def stop(self, name: str) -> None:
        self._barrier()
        t = time.time() - self._open.pop(name)
        self._sections.setdefault(name, []).append(t)

    def __getitem__(self, name: str) -> float:
        return sum(self._sections.get(name, [0.0]))

    class _Section:
        def __init__(self, timer, name):
            self.timer, self.name = timer, name

        def __enter__(self):
            self.timer.start(self.name)

        def __exit__(self, *exc):
            self.timer.stop(self.name)

    def section(self, name: str) -> "Timer._Section":
        return Timer._Section(self, name)

    def report(self) -> str:
        lines = ["", "TIMING RESULTS", "=" * 50, ""]
        for name, times in self._sections.items():
            if len(times) == 1:
                lines.append(f"{name}")
                lines.append("-" * len(name))
                lines.append(f"   time (sec): {times[0]:.6f}")
            else:
                lines.append(f"{name} ({len(times)} repeats)")
                lines.append("-" * len(name))
                lines.append(f"  total (sec): {sum(times):.6f}")
                lines.append(f"   avg  (sec): {sum(times)/len(times):.6f}")
            lines.append("")
        return "\n".join(lines)

    def __str__(self) -> str:
        return self.report()
