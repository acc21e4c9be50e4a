"""Query plans: the engine's declared query surface.

``QUERIES`` maps query-key → callable(spark, sf_dir) → DataFrame and
``ORACLES`` maps the same key → equivalent DuckDB SQL (absent for
rows-only checks). Keys follow SURVEY.md §2's inventory.
"""

from __future__ import annotations

from .registry import ORACLES, QUERIES, query

# importing the modules populates the registry
from . import agg_ext  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import analytics2  # noqa: E402,F401
from . import breadth  # noqa: E402,F401
from . import breadth2  # noqa: E402,F401
from . import core  # noqa: E402,F401
from . import datasetops  # noqa: E402,F401
from . import gaps  # noqa: E402,F401
from . import geo  # noqa: E402,F401
from . import graph_ext  # noqa: E402,F401
from . import llm_ext  # noqa: E402,F401
from . import llm_ext2  # noqa: E402,F401
from . import ml_ext  # noqa: E402,F401
from . import mlmath  # noqa: E402,F401
from . import joins_ext  # noqa: E402,F401
from . import modern  # noqa: E402,F401
from . import mutate  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import timeseries_ext  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401
from . import quality_ext  # noqa: E402,F401
from . import round4  # noqa: E402,F401
from . import round4b  # noqa: E402,F401
from . import round4c  # noqa: E402,F401
from . import round4d  # noqa: E402,F401
from . import round4e  # noqa: E402,F401
from . import round4f  # noqa: E402,F401
from . import round4g  # noqa: E402,F401
from . import round4h  # noqa: E402,F401
from . import round4i  # noqa: E402,F401
from . import round4j  # noqa: E402,F401
from . import round4k  # noqa: E402,F401
from . import round4l  # noqa: E402,F401
from . import round4m  # noqa: E402,F401
from . import round4n  # noqa: E402,F401
from . import round4o  # noqa: E402,F401
from . import round4p  # noqa: E402,F401
from . import round4q  # noqa: E402,F401
from . import round4r  # noqa: E402,F401
from . import round4s  # noqa: E402,F401
from . import round4t  # noqa: E402,F401
from . import round4u  # noqa: E402,F401
from . import round4v  # noqa: E402,F401
from . import round4w  # noqa: E402,F401
from . import round4x  # noqa: E402,F401
from . import round4y  # noqa: E402,F401
from . import round4z  # noqa: E402,F401
from . import round4aa  # noqa: E402,F401
from . import round4ab  # noqa: E402,F401
from . import round4ac  # noqa: E402,F401
from . import round4ad  # noqa: E402,F401
from . import round4ae  # noqa: E402,F401
from . import round5  # noqa: E402,F401
from . import stateful_q  # noqa: E402,F401
from . import stats_ext  # noqa: E402,F401
from . import stream_queries  # noqa: E402,F401
from . import textlm  # noqa: E402,F401
from . import textscale  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import udx  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
from . import round5b  # noqa: E402,F401
from . import round5c  # noqa: E402,F401
from . import round5d  # noqa: E402,F401
from . import round5e  # noqa: E402,F401
from . import round5f  # noqa: E402,F401
from . import round5g  # noqa: E402,F401
from . import round5h  # noqa: E402,F401
from . import round5i  # noqa: E402,F401
from . import round5j  # noqa: E402,F401
from . import round5k  # noqa: E402,F401
from . import round6  # noqa: E402,F401
from . import round7  # noqa: E402,F401
from . import round7b  # noqa: E402,F401
from . import round8  # noqa: E402,F401
from . import round8b  # noqa: E402,F401
from . import round9  # noqa: E402,F401
from . import round9b  # noqa: E402,F401
from . import round9c  # noqa: E402,F401
from . import round10  # noqa: E402,F401
from . import round10b  # noqa: E402,F401
from . import round10c  # noqa: E402,F401
from . import round10d  # noqa: E402,F401
from . import round10e  # noqa: E402,F401
from . import round10f  # noqa: E402,F401
from . import round10g  # noqa: E402,F401
from . import round11  # noqa: E402,F401
from . import round11b  # noqa: E402,F401
from . import round11c  # noqa: E402,F401
from . import round11d  # noqa: E402,F401
from . import round11e  # noqa: E402,F401
from . import round11f  # noqa: E402,F401
from . import round11g  # noqa: E402,F401
from . import round11h  # noqa: E402,F401
from . import round11i  # noqa: E402,F401
from . import round11j  # noqa: E402,F401
from . import round11k  # noqa: E402,F401
from . import round11l  # noqa: E402,F401
from . import round11m  # noqa: E402,F401
from . import round11n  # noqa: E402,F401
from . import round11o  # noqa: E402,F401
from . import round11p  # noqa: E402,F401
from . import round11q  # noqa: E402,F401
from . import round11r  # noqa: E402,F401
from . import round11s  # noqa: E402,F401
