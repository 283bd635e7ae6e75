"""Sink circuit breaker: consecutive-failure open, capped exponential
backoff, reopen probe.

The reference's bulk writer opens a circuit after consecutive sink
failures and backs off exponentially up to ``esCircuitMaxBackoffMs``
before probing again (``pkg/pipeline/sink/bulkwriter.go:50-96``). Here
the "sink" is the lake MERGE inside foreachBatch: the breaker throttles
the whole tail (a persistently failing sink must NOT dead-letter every
batch at full speed), and one successful batch closes it again.

Clock and sleep are injectable so tests assert the backoff ladder without
wall-clock waits.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass(frozen=True)
class CircuitBreakerConfig:
    failure_threshold: int = 3          # consecutive failures that open the circuit
    base_backoff_ms: int = 200          # first open interval
    max_backoff_ms: int = 30_000        # esCircuitMaxBackoffMs analog


@dataclass
class CircuitBreaker:
    config: CircuitBreakerConfig = field(default_factory=CircuitBreakerConfig)
    sleep: object = time.sleep          # injectable for tests
    consecutive_failures: int = 0
    opens: int = 0                      # times the circuit opened (metrics)

    @property
    def is_open(self) -> bool:
        return self.consecutive_failures >= self.config.failure_threshold

    def current_backoff_ms(self) -> int:
        """Exponential in the failures PAST the threshold, capped."""
        if not self.is_open:
            return 0
        exp = self.consecutive_failures - self.config.failure_threshold
        return min(self.config.base_backoff_ms * (2**exp), self.config.max_backoff_ms)

    def before_attempt(self) -> None:
        """Open circuit: wait out the current backoff, then let ONE probe
        attempt through (half-open semantics)."""
        wait = self.current_backoff_ms()
        if wait > 0:
            self.sleep(wait / 1000.0)

    def record_success(self) -> None:
        self.consecutive_failures = 0

    def record_failure(self) -> None:
        self.consecutive_failures += 1
        if self.consecutive_failures == self.config.failure_threshold:
            self.opens += 1
