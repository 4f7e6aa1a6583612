"""HTML scrape source (SURVEY §2.1 S9): index constituents + changes.

Reference: ``pd.read_html`` of the Wikipedia S&P 500 page
(pipelines/universe_flow.py:16-35), then header munging (lower,
space→underscore — F11) and "%B %d, %Y" date parsing (F6).

The fetch is injected (``tables`` = list of pandas frames, as
``pd.read_html`` would return); parsing/normalization is the engine's
part and is implemented + tested here.
"""

from __future__ import annotations

import pandas as pd


def _norm_cols(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [str(c).strip().lower().replace(" ", "_") for c in df.columns]
    return df


def parse_constituent_tables(
    tables: list[pd.DataFrame],
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """(current_members, changes) from the scraped tables.

    current: columns [ticker]; changes: [date, added_ticker,
    removed_ticker] with '%B %d, %Y' dates parsed (reference F6).
    """
    current = _norm_cols(tables[0])
    changes = _norm_cols(tables[1])
    cur = current.rename(columns={"symbol": "ticker"})[["ticker"]].dropna()
    ch = changes.rename(
        columns={"added": "added_ticker", "removed": "removed_ticker"}
    ).copy()
    ch["date"] = pd.to_datetime(ch["date"], format="%B %d, %Y").dt.date
    keep = [c for c in ["date", "added_ticker", "removed_ticker"] if c in ch.columns]
    return cur.reset_index(drop=True), ch[keep].reset_index(drop=True)
