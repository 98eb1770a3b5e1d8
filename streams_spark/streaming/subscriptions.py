"""Subscriptions: route-keyed SegmentStatus notifications.

The reference lets consumers register callbacks on "data arrived"
notifications per space or segment (SubscribeToSpace/SubscribeToSegment —
/root/reference/client.go:188-206; the server notifies its supervisor
with a SegmentStatus after every committed chunk —
/root/reference/server/pebble/service.go:388-392).

Spark-side, the same surface has two natural carriers:

- **SubscriptionHub** — in-process route-keyed dispatch, fed by the
  produce sink after each committed batch (the exact analog of the
  reference's post-commit notify). Deterministic, works in batch and
  foreachBatch streaming.
- **SegmentStatusListener** — a StreamingQueryListener adapter that fires
  the hub from query-progress events, for consumers who only observe the
  running StreamingQuery (no sink cooperation needed). Progress events
  carry per-batch row counts, not per-segment detail, so the hub route is
  the space wildcard.
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Callable
from dataclasses import dataclass

try:  # StreamingQueryListener import path is stable in pyspark >= 3.4
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover
    StreamingQueryListener = object  # type: ignore[assignment]


@dataclass(frozen=True)
class SegmentStatus:
    """Produce result / notification payload
    (/root/reference/server/messages.go:38-45)."""

    space: str
    segment: str
    first_sequence: int
    last_sequence: int
    n_entries: int
    batch_id: int


Callback = Callable[[SegmentStatus], None]

_WILDCARD = "*"


class SubscriptionHub:
    """Route-keyed callback dispatch: (space) or (space, segment) routes,
    mirroring the reference's bus routes `space:{space}` and
    `segment:{space}:{segment}` (client.go:190,201)."""

    def __init__(self) -> None:
        self._routes: dict[tuple[str, str], list[Callback]] = defaultdict(list)

    def subscribe_to_space(self, space: str, cb: Callback) -> None:
        self._routes[(space, _WILDCARD)].append(cb)

    def subscribe_to_segment(self, space: str, segment: str, cb: Callback) -> None:
        self._routes[(space, segment)].append(cb)

    def notify(self, status: SegmentStatus) -> None:
        for cb in self._routes.get((status.space, _WILDCARD), []):
            cb(status)
        for cb in self._routes.get((status.space, status.segment), []):
            cb(status)

    def notify_batch(self, batch_id: int, segment_rows: list[dict]) -> None:
        """Dispatch one committed produce batch (the sink's status rows)."""
        for r in segment_rows:
            self.notify(
                SegmentStatus(
                    space=r["space"],
                    segment=r["segment"],
                    first_sequence=int(r["first_sequence"]),
                    last_sequence=int(r["last_sequence"]),
                    n_entries=int(r["n"]),
                    batch_id=batch_id,
                )
            )


class SegmentStatusListener(StreamingQueryListener):
    """StreamingQueryListener → hub adapter: notifies on every completed
    micro-batch with rows (space-wildcard granularity; progress events
    don't carry per-segment detail)."""

    def __init__(self, hub: SubscriptionHub, space: str) -> None:
        self.hub = hub
        self.space = space

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        if p.numInputRows:
            self.hub.notify(
                SegmentStatus(
                    space=self.space,
                    segment=_WILDCARD,
                    first_sequence=0,
                    last_sequence=0,
                    n_entries=int(p.numInputRows),
                    batch_id=int(p.batchId),
                )
            )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
