"""Sink base classes: a format (graph → string) + a file writer with the
reference's overwrite semantics (refuses an existing output dir unless
``overwrite=True``; reference basicSinks.scala:34-49) and streaming append
into UTC-timestamped subdirectories (basicSinks.scala:193-211)."""

from __future__ import annotations

import os
import shutil
import subprocess
from abc import ABC, abstractmethod
from datetime import datetime, timezone

from ..plans.graph import GraphEdge, GraphNode


class BaseGraphFormat(ABC):
    """Formatter contract (reference basicSinks.scala:51-53). Any callable
    ``(nodes, edges) -> str`` can also act as a custom format."""

    @abstractmethod
    def to_graph_string(self, nodes: list[GraphNode], edges: list[GraphEdge]) -> str: ...


def write_graph_file(path: str, contents: str, overwrite: bool = False) -> str:
    """Write into directory ``path`` (created); error if it exists and not
    ``overwrite`` — same contract as the reference's file writer."""
    if os.path.exists(path):
        if not overwrite:
            raise ValueError(
                f"output dir '{path}' already exists; pass overwrite=True to replace it"
            )
        shutil.rmtree(path)
    os.makedirs(path)
    return path


def try_generate_image(command: str, args: list[str]) -> bool:
    """Best-effort subprocess rendering (dot/mmdc); silently skipped when the
    tool is absent (reference SinkUtils.scala:36-109)."""
    if shutil.which(command) is None:
        return False
    try:
        subprocess.run([command, *args], check=True, capture_output=True, timeout=60)
        return True
    except Exception:
        return False


class GraphFileSink(BaseGraphFormat, ABC):
    """File-writing sink: ``write`` = batch (one dir), ``append`` = streaming
    (timestamped subdir per call, matching the reference listener sink)."""

    filename_suffix: str = "txt"
    filename_prefix: str = "sqlflow"

    def write(
        self,
        nodes: list[GraphNode],
        edges: list[GraphEdge],
        output_dir: str,
        overwrite: bool = False,
    ) -> str:
        write_graph_file(output_dir, "", overwrite)
        path = os.path.join(output_dir, f"{self.filename_prefix}.{self.filename_suffix}")
        with open(path, "w") as f:
            f.write(self.to_graph_string(nodes, edges))
        self.post_write(output_dir)
        return path

    def append(self, nodes: list[GraphNode], edges: list[GraphEdge], output_dir: str) -> str:
        os.makedirs(output_dir, exist_ok=True)
        stamp = datetime.now(timezone.utc).strftime("%Y%m%d%H%M%S%f")[:-3]
        target = os.path.join(output_dir, stamp)
        n = 0
        while os.path.exists(target):  # same-millisecond appends
            n += 1
            target = os.path.join(output_dir, f"{stamp}-{n}")
        return self.write(nodes, edges, target, overwrite=True)

    def post_write(self, output_dir: str) -> None:  # image generation hook
        return None
