"""Structured Streaming variants of the batch operators.

The reference has no streaming surface (SURVEY.md §2: "absent from the
reference"); these exist for the extension contract — the same session
semantics, expressed over ``readStream`` so late data and incremental
arrival are handled by watermarks instead of batch reruns.
"""

from .sessions import (
    stateful_topk_values,
    stateful_user_counts,
    stream_session_counts,
    stream_window_counts,
)

__all__ = [
    "stateful_topk_values",
    "stateful_user_counts",
    "stream_session_counts",
    "stream_window_counts",
]
