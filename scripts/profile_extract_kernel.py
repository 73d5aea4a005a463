#!/usr/bin/env python
"""Single-process profile of the extract-stage per-batch work (guide §1:
know where the core-seconds go before changing anything).

Times, over one synthetic Arrow-batch-sized chunk of the bench corpus:
  gen        — corpus generation (not part of the timed bench window)
  preprocess — kernels.textprep.preprocess_series
  extract    — the extract_message_cached loop (cold + warm cache)
  assemble   — the pandas struct-column assembly the pandas_udf returns
  to_arrow   — pandas -> Arrow conversion of that struct frame
"""

from __future__ import annotations

import sys
import time

import pandas as pd
import pyarrow as pa

sys.path.insert(0, "/root/repo")

from amharic_ecommerce_data_extractor_spark.data.synthetic import (  # noqa: E402
    generate_messages_pandas,
)
from amharic_ecommerce_data_extractor_spark.kernels import labeler as lb  # noqa: E402
from amharic_ecommerce_data_extractor_spark.kernels import textprep as tp  # noqa: E402


def t(label, fn, *a, **k):
    t0 = time.perf_counter()
    r = fn(*a, **k)
    dt = time.perf_counter() - t0
    print(f"{label::<28} {dt:8.3f} s")
    return r, dt


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    (pdf, _) = t("gen", generate_messages_pandas, n_rows=n, n_vendors=50)
    texts = pdf["content"]
    print(f"rows={len(texts)} distinct={texts.nunique()}")

    clean, dt_pre = t("preprocess", tp.preprocess_series, texts)
    print(f"  distinct clean={clean.nunique()}")

    def run_extract():
        return [lb.extract_message_cached(c) for c in clean]

    lb.extract_message_cached.cache_clear()
    recs, dt_cold = t("extract (cold cache)", run_extract)
    recs, dt_warm = t("extract (warm cache)", run_extract)

    fields = ["tokens", "labels", "products", "prices", "locations",
              "contacts", "price_values"]

    def assemble():
        out = pd.DataFrame(index=clean.reset_index(drop=True).index)
        out["preprocessed_text"] = clean.reset_index(drop=True)
        for f in fields:
            out[f] = [r[f] for r in recs]
        return out

    out, dt_asm = t("assemble", assemble)
    _, dt_arrow = t("to_arrow", pa.Table.from_pandas, out)

    total = dt_pre + dt_cold + dt_asm + dt_arrow
    print(f"\nper-row total (cold) {1e6*total/n:.1f} us; "
          f"throughput {n/total:.0f} rows/s/core")
    for lbl, d in [("preprocess", dt_pre), ("extract", dt_cold),
                   ("assemble", dt_asm), ("to_arrow", dt_arrow)]:
        print(f"  {lbl:<12} {100*d/total:5.1f}%")


if __name__ == "__main__":
    main()
