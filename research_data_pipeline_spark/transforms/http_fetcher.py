"""Live HTTP implementation of the enrichment ``Fetcher`` interface.

The reference enriches articles through the public Crossref REST API
with a sequential, sleep-throttled GET loop at ~2.5 requests/s and
leaves rows unchanged on any non-'ok' response
(/root/reference/dags/scripts/augmentations.py:10-57). This is the
Spark-side equivalent: a picklable, stdlib-only (urllib) callable that
each ``mapInPandas`` task holds privately, so

- the RATE LIMIT is per task: with ``P`` concurrent enrichment tasks,
  set ``rate_per_s = global_budget / P`` (the resumable driver loop in
  ``augment.enrich_articles_resumable`` sizes partitions from
  batch_size, so P is known);
- a task retry re-fetches only its own partition, and the parquet
  fetch-cache keeps replays idempotent.

Failure policy mirrors the reference: HTTP 4xx (except 429) → the DOI is
skipped and the row stays unchanged; 429/5xx and transport errors →
exponential backoff (honoring ``Retry-After``) then retry, and a DOI
that still fails after ``max_retries`` is skipped rather than failing
the partition — enrichment is best-effort, completeness comes from the
resumable anti-join pass picking it up next run.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request


class RateLimitedHttpFetcher:
    """``Fetcher``-shaped callable: ``list[doi] -> {doi: (type, n_cites,
    issn | None)}`` over a Crossref-style JSON API.

    ``GET {base_url}/{quoted doi}`` must return
    ``{"message": {"type": ..., "is-referenced-by-count": ...,
    "ISSN": [...]}}`` — the public Crossref works-endpoint shape.

    Token-bucket throttle (min-interval pacing): the first request goes
    immediately, each subsequent one waits until ``1/rate_per_s`` after
    the previous send. ``clock``/``sleep`` are injectable for
    deterministic tests.
    """

    def __init__(
        self,
        base_url: str,
        rate_per_s: float = 2.5,
        timeout_s: float = 10.0,
        max_retries: int = 3,
        backoff_s: float = 0.5,
        user_agent: str = "research-data-pipeline-spark/0.1",
        clock=time.monotonic,
        sleep=time.sleep,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.min_interval = 1.0 / rate_per_s if rate_per_s > 0 else 0.0
        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.user_agent = user_agent
        self._clock = clock
        self._sleep = sleep
        self._next_ok_at = 0.0

    # -- throttle ----------------------------------------------------------
    def _throttle(self) -> None:
        now = self._clock()
        if now < self._next_ok_at:
            self._sleep(self._next_ok_at - now)
            now = self._next_ok_at
        self._next_ok_at = now + self.min_interval

    # -- transport ---------------------------------------------------------
    def _get_json(self, url: str) -> dict | None:
        """One GET with throttle + retry. None → treat as a miss."""
        for attempt in range(self.max_retries + 1):
            self._throttle()
            try:
                req = urllib.request.Request(
                    url, headers={"User-Agent": self.user_agent}
                )
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except urllib.error.HTTPError as e:
                retryable = e.code == 429 or e.code >= 500
                if not retryable:
                    return None  # hard miss (404 etc.): leave row unchanged
                if attempt >= self.max_retries:
                    return None  # best-effort: resumable pass retries later
                retry_after = e.headers.get("Retry-After") if e.headers else None
                if retry_after is not None:
                    try:
                        delay = float(retry_after)
                    except ValueError:
                        delay = self.backoff_s * (2**attempt)
                else:
                    delay = self.backoff_s * (2**attempt)
                self._sleep(delay)
            except (urllib.error.URLError, TimeoutError):
                if attempt >= self.max_retries:
                    return None
                self._sleep(self.backoff_s * (2**attempt))
        return None

    # -- Fetcher interface -------------------------------------------------
    def __call__(self, dois: list[str]) -> dict[str, tuple[str, int, str | None]]:
        out: dict[str, tuple[str, int, str | None]] = {}
        for doi in dois:
            url = f"{self.base_url}/{urllib.parse.quote(str(doi), safe='')}"
            payload = self._get_json(url)
            if payload is None:
                continue
            # Crossref envelope: {"status": "ok", "message-type": "work",
            # "message": {...}} — the reference only applies updates when
            # status == 'ok' (augmentations.py:33-44; a missing key raises
            # KeyError there and the update is skipped). Same here: no
            # explicit 'ok', no update.
            if payload.get("status") != "ok":
                continue
            msg = payload.get("message") or {}
            typ = msg.get("type")
            if typ is None:
                continue
            n_cites = int(msg.get("is-referenced-by-count", 0) or 0)
            issns = msg.get("ISSN") or []
            issn = str(issns[0]) if issns else None
            out[str(doi)] = (str(typ), n_cites, issn)
        return out
