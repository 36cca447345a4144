"""Command-line tools (L6 of the layer map, SURVEY §1).

Every major component of the reference exposes a main(); here they are
subcommands of one entry point:

    python -m webgraph_tpu <command> ...

Commands mirror the reference CLIs: ``bvgraph`` (BVGraph.main),
``efgraph`` (EFGraph.main), ``transform`` (Transform.main:2092-2106 verb
set), ``ascii``/``arclist``/``scattered`` (import formats), ``stats``
(Stats.main), ``hyperball`` (HyperBall.main), ``bfs``/``cc``/``scc``
(algo mains), ``speedtest`` (test/SpeedTest).
"""

from .main import main

__all__ = ["main"]
