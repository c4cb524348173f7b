"""Scrub/pipeline configuration.

Mirrors the reference's scalar config state (candidate identity, alias
bank, date window — ``/root/reference/SMParser/smparserbase.py:28-47``)
as an immutable dataclass that is shipped to executors once (broadcast /
closure capture) instead of living as mutable parser-instance state.

The reference derives ``first_date = last_date - relativedelta(months=
months_back)`` and week bins (``smparserbase.py:98-103``); we reproduce
the same derivation but with a *fixed* ``last_date`` default instead of
wall-clock ``datetime.today()`` so runs are deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta

# Fixed sentinel used where the reference fell back to datetime.today()
# (parse_time, smparserbase.py:193-211). Deterministic by design.
UNPARSEABLE_TS_SENTINEL = datetime(1970, 1, 1)

DEFAULT_LAST_DATE = datetime(2024, 12, 31)


def _add_months(dt: datetime, months: int) -> datetime:
    """dateutil.relativedelta(months=n) semantics: clamp day to month end."""
    month_index = (dt.month - 1) + months
    year = dt.year + month_index // 12
    month = month_index % 12 + 1
    # clamp day into target month (relativedelta behavior)
    for day in (dt.day, 30, 29, 28):
        try:
            return dt.replace(year=year, month=month, day=day)
        except ValueError:
            continue
    raise AssertionError("unreachable")


@dataclass(frozen=True)
class ScrubConfig:
    """Identity + date-window config for the scrub pipeline."""

    candidate_id: str = "000"
    first_name: str = "J"
    last_name: str = "Doe"
    username: str = "default"
    person_alias: str = ""  # comma-separated, as in the reference
    months_back: int = 24
    last_date: datetime = DEFAULT_LAST_DATE
    # reference bug-for-bug mode: alias substitution case-SENSITIVE with
    # count=2 (re.I passed as the `count` positional at smparserbase.py:94)
    reproduce_alias_bug: bool = True

    @property
    def first_date(self) -> datetime:
        """smparserbase.py:100 — last_date minus months_back months."""
        return _add_months(self.last_date, -self.months_back)

    @property
    def num_weeks(self) -> int:
        """smparserbase.py:101."""
        return (self.last_date - self.first_date).days // 7 + 2

    @property
    def week_bins(self) -> list[datetime]:
        """smparserbase.py:102 — 7-day boundaries back from last_date."""
        return [self.last_date - timedelta(days=7 * i) for i in range(self.num_weeks)]

    @property
    def aliases(self) -> list[str]:
        """smparserbase.py:91-92 — comma-split, stripped; empty → none."""
        if not self.person_alias.strip():
            return []
        return [a.strip() for a in self.person_alias.split(",")]

    @property
    def person_name(self) -> str:
        return f"{self.first_name} {self.last_name}"


# The reference's only fixture: fake_GUI_output (smparserApp.py:80-92).
FIXTURE_CONFIG = ScrubConfig(
    candidate_id="011",
    first_name="Maggie",
    last_name="Nail",
    username="maggie.nail",
    person_alias="megs, mags",
    months_back=24,
    last_date=datetime(2022, 3, 24),
)
