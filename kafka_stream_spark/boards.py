"""Board configurations (SURVEY.md §2.12): the kafka_s.py vs kafka_a.py
deltas as data. The reference maintains two ~640-line near-identical
files; the engine's two boards differ only in these literals and the
source field map (streaming.sources.FIELD_MAPS, keyed by ``name``).

Top-level module (imported by both plans.* and streaming.*) so neither
package pulls the other in at import time.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class BoardConfig:
    name: str
    src_type: str  # srcType literal (kafka_s.py:318 vs kafka_a.py:322)
    webname: str = "巨潮资讯网"  # kafka_s.py:317
    rel_type: str = "直接关联"  # kafka_s.py:395-403


NEEQ = BoardConfig(name="neeq", src_type="新三板公告")
ASHARE = BoardConfig(name="ashare", src_type="A股公告")
