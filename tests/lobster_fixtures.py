"""Deterministic LOBSTER-shaped fixtures (FIXTURES.md §1-2, seed 42).

Generates per-(ticker, day) message+L1-book data with planted edge
cases: iceberg refills at various distances around the 1 ms tolerance
(including exactly-at-tolerance), timestamp bursts, bin-boundary
events, sentinel book rows, and outside-spread hidden executions.

Writes: one wide parquet table (messages ⨝ L1 book, explicit seq key)
plus headerless message/orderbook CSV pairs for the ingest-edge test.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

TICKERS = ("AAA", "BBB")
DAYS = ("2018-03-01", "2018-03-02")
N_BASE = 1500  # base events per (ticker, day) before planted rows
SENTINEL = 9_999_999_999
TOL_US = 1_000  # 1 ms iceberg tolerance

# planted refill offsets (µs) after a type-4 exec; <=1000 must tag
REFILL_OFFSETS_US = (100, 500, 999, 1000, 1001, 1500)


def generate_day(rng: np.random.Generator, ticker: str, day: str) -> pd.DataFrame:
    base = pd.Timestamp(f"{day} 09:30:00")
    end = pd.Timestamp(f"{day} 16:00:00")
    span_us = int((end - base).value // 1000)

    n = N_BASE
    offs = np.sort(rng.integers(0, span_us, size=n))
    # bursts: ~5% of rows duplicate the previous timestamp
    burst = rng.random(n) < 0.05
    offs[burst] = np.roll(offs, 1)[burst]
    # bin-boundary plants: snap ~2% to exact 15s multiples
    snap = rng.random(n) < 0.02
    offs[snap] = (offs[snap] // 15_000_000) * 15_000_000

    event_type = rng.choice(
        [1, 2, 3, 4, 5], size=n, p=[0.45, 0.10, 0.20, 0.20, 0.05]
    )
    direction = rng.choice([-1, 1], size=n)
    size = np.maximum(1, rng.lognormal(4.0, 1.2, size=n)).astype("int64")
    # price random walk in ticks of 100 (price = dollars * 1e4)
    mid = 1_000_000 + np.cumsum(rng.choice([-100, 0, 100], size=n))
    half_spread = 100 * rng.integers(1, 4, size=n)
    ask = mid + half_spread
    bid = mid - half_spread
    price = np.where(direction == 1, bid, ask).astype("int64")
    # hidden execs (type 5): some outside the spread (M5 edge cases)
    hid = event_type == 5
    out_lo = hid & (rng.random(n) < 0.25)
    out_hi = hid & ~out_lo & (rng.random(n) < 0.25)
    price[out_lo] = bid[out_lo] - 100  # below bid -> agg_ratio <= 0
    price[out_hi] = ask[out_hi] + 100  # above ask -> agg_ratio >= 1

    df = pd.DataFrame(
        {
            "offset_us": offs,
            "event_type": event_type,
            "order_ID": rng.integers(1_000_000, 9_999_999, size=n),
            "size": size,
            "price": price,
            "direction": direction,
            "ask_price_1": ask.astype("int64"),
            "ask_size_1": rng.integers(100, 5000, size=n),
            "bid_price_1": bid.astype("int64"),
            "bid_size_1": rng.integers(100, 5000, size=n),
        }
    )

    # planted iceberg refills: for the first type-4 rows, append a
    # type-1 submission at the same price, offset cycled over
    # REFILL_OFFSETS_US
    execs = df[df.event_type == 4].head(60)
    refills = []
    for i, (_, row) in enumerate(execs.iterrows()):
        off = REFILL_OFFSETS_US[i % len(REFILL_OFFSETS_US)]
        refills.append(
            {
                "offset_us": row.offset_us + off,
                "event_type": 1,
                "order_ID": int(row.order_ID) + 50_000_000,
                "size": int(row["size"]),
                "price": int(row.price),
                "direction": int(row.direction),
                "ask_price_1": int(row.ask_price_1),
                "ask_size_1": int(row.ask_size_1),
                "bid_price_1": int(row.bid_price_1),
                "bid_size_1": int(row.bid_size_1),
            }
        )
    df = pd.concat([df, pd.DataFrame(refills)], ignore_index=True)

    # sentinel book rows (~1%)
    m = rng.random(len(df)) < 0.01
    df.loc[m, "ask_price_1"] = SENTINEL
    df.loc[m, "bid_price_1"] = -SENTINEL

    df = df.sort_values(["offset_us", "order_ID"], kind="stable").reset_index(
        drop=True
    )
    df["seq"] = np.arange(len(df), dtype="int64")
    df["ticker"] = ticker
    df["datetime"] = (base.value // 1000 + df.offset_us).astype(
        "datetime64[us]"
    )
    return df.drop(columns=["offset_us"])


def write_fixtures(root: str) -> str:
    """Generate all ticker-days; write wide parquet + CSV pairs.
    Returns the wide-parquet path."""
    rng = np.random.default_rng(42)
    frames = []
    csv_dir = os.path.join(root, "csv")
    os.makedirs(csv_dir, exist_ok=True)
    for ticker in TICKERS:
        for day in DAYS:
            df = generate_day(rng, ticker, day)
            frames.append(df)
            base = pd.Timestamp(f"{day} 00:00:00")
            # datetime64[us].astype(int64) is µs; base.value is ns
            secs = (df["datetime"].astype("int64") - base.value // 1000) / 1e6
            msg = pd.DataFrame(
                {
                    "time": secs.round(6),
                    "event_type": df.event_type,
                    "order_ID": df.order_ID,
                    "size": df["size"],
                    "price": df.price,
                    "direction": df.direction,
                }
            )
            book = df[["ask_price_1", "ask_size_1", "bid_price_1", "bid_size_1"]]
            msg.to_csv(
                os.path.join(csv_dir, f"{ticker}_{day}_34200000_57600000_message_1.csv"),
                index=False,
                header=False,
            )
            book.to_csv(
                os.path.join(
                    csv_dir, f"{ticker}_{day}_34200000_57600000_orderbook_1.csv"
                ),
                index=False,
                header=False,
            )
    wide = pd.concat(frames, ignore_index=True)
    out = os.path.join(root, "lob_wide.parquet")
    wide.to_parquet(out, index=False)
    return out
