"""R1 — the reference's paginated per-wallet source as a FIRST-CLASS
Spark data source (the Spark 4 Python DataSource API).

The reference fetches each wallet's transfer history as ascending
pages from an HTTP API inside a serial Python loop
(walletDataConsumer.py:51-83: ``page`` increments until a short page;
``startblock``/``endblock`` restrict the scan server-side at :57;
``sort=asc`` at :51; ``status != '1'`` ends the scan at :74-80). This
module expresses the SAME contract Spark-natively:

- one :class:`InputPartition` per wallet — the reference's serial
  wallet loop becomes an embarrassingly parallel scan (a 1000-executor
  cluster pulls 1000 wallets concurrently);
- pagination is the in-partition read loop, ascending pages;
- R2's server-side block range is genuine FILTER PUSHDOWN:
  :meth:`WalletTransfersReader.pushFilters` consumes
  ``blockNumber``/``timeStamp`` comparisons, skips whole PAGES via the
  page-header block range (the pagination analog of file skipping),
  and — because pages are ascending — stops a wallet's scan early once
  the page floor passes the upper bound;
- R4's error-as-end-of-scan: a page with ``status != "1"`` terminates
  that wallet's read (the reference stops paging on API errors).

The on-disk layout stands in for the HTTP API (this environment has no
network): ``<root>/<wallet>/page-NNNN.json``, each file one API
response ``{"status": "1", "wallet": w, "startblock": lo, "endblock":
hi, "result": [tx, ...]}`` with all tx fields as strings, exactly the
tokentx wire shape. ``write_wallet_pages`` builds such a dump from any
raw-tokentx frame.

Integral fields (``blockNumber``, ``timeStamp``) surface as LONG — the
source-edge ``int()`` casts of walletDataConsumer.py:95-96 — which is
also what makes the range pushdown typed; everything else stays string
like the wire format.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

def _page_files(wallet_dir: str) -> list[str]:
    """Page files of a wallet in true page order: sorted by the PARSED
    integer index, not lexicographically — ``page-10000`` would sort
    before ``page-2000`` as a string, and the stream reader slices this
    list by [start:end) offsets, so string order would deliver rows
    under the wrong offsets past 9999 pages."""
    files = glob.glob(os.path.join(wallet_dir, "page-*.json"))
    return sorted(
        files,
        key=lambda p: int(os.path.basename(p)[len("page-") : -len(".json")]),
    )


SCHEMA_DDL = (
    "wallet_address string, tx_hash string, blockNumber long, timeStamp long, "
    "from_address string, to_address string, contractAddress string, "
    "tokenName string, tokenSymbol string, tokenDecimal string, value string"
)

#: wire-field order inside each page's ``result`` records
_WIRE = (
    "hash", "blockNumber", "timeStamp", "from", "to",
    "contractAddress", "tokenName", "tokenSymbol", "tokenDecimal", "value",
)

#: columns the reader can consume range predicates on (source-side
#: ints, like the reference's startblock/endblock)
_PUSHABLE = {"blockNumber", "timeStamp"}


class _WalletPartition(InputPartition):
    def __init__(self, wallet_dir: str):
        self.wallet_dir = wallet_dir


class WalletTransfersReader(DataSourceReader):
    def __init__(self, options):
        self.root = options["path"]
        # per-column [lo, hi] bounds consumed from pushed filters
        self.bounds: dict[str, list] = {}

    def pushFilters(self, filters):
        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if col not in _PUSHABLE:
                yield f  # unsupported: Spark keeps evaluating it
                continue
            lo, hi = self.bounds.setdefault(col, [None, None])
            if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                v = f.value + 1 if isinstance(f, GreaterThan) else f.value
                self.bounds[col][0] = v if lo is None else max(lo, v)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                v = f.value - 1 if isinstance(f, LessThan) else f.value
                self.bounds[col][1] = v if hi is None else min(hi, v)
            elif isinstance(f, EqualTo):
                # intersect, don't overwrite: consumed filters vanish
                # from Spark's plan, so `col = 5 AND col > 10` must
                # leave an empty interval (no rows), not reset to [5,5]
                self.bounds[col][0] = f.value if lo is None else max(lo, f.value)
                self.bounds[col][1] = f.value if hi is None else min(hi, f.value)
            else:
                yield f

    def partitions(self):
        wallets = sorted(
            d for d in glob.glob(os.path.join(self.root, "*")) if os.path.isdir(d)
        )
        return [_WalletPartition(d) for d in wallets]

    def _in_bounds(self, col: str, v: int) -> bool:
        lo, hi = self.bounds.get(col, (None, None))
        return (lo is None or v >= lo) and (hi is None or v <= hi)

    def read(self, partition: _WalletPartition):
        """Arrow fast path: each page's surviving rows become one
        pyarrow RecordBatch (the Spark 4 reader protocol accepts
        RecordBatches in place of row tuples), so rows cross the
        Python->JVM boundary as columnar Arrow buffers instead of
        per-row pickled tuples — the same upgrade the export sink's
        reader got, on the reference's own source."""
        import pyarrow as pa

        arrow_schema = pa.schema(
            [
                ("wallet_address", pa.string()),
                ("tx_hash", pa.string()),
                ("blockNumber", pa.int64()),
                ("timeStamp", pa.int64()),
                ("from_address", pa.string()),
                ("to_address", pa.string()),
                ("contractAddress", pa.string()),
                ("tokenName", pa.string()),
                ("tokenSymbol", pa.string()),
                ("tokenDecimal", pa.string()),
                ("value", pa.string()),
            ]
        )
        blo, bhi = self.bounds.get("blockNumber", (None, None))
        for page_file in _page_files(partition.wallet_dir):
            with open(page_file) as f:
                page = json.load(f)
            if page.get("status") != "1":
                return  # R4: API error ends this wallet's scan
            # page skipping on the header block range; ascending pages
            # mean a floor past the upper bound ends the scan entirely
            if blo is not None and page.get("endblock") is not None and page["endblock"] < blo:
                continue
            if bhi is not None and page.get("startblock") is not None and page["startblock"] > bhi:
                return
            wallet = page.get("wallet", os.path.basename(partition.wallet_dir))
            rows = []
            for tx in page.get("result", ()):
                block, ts = int(tx["blockNumber"]), int(tx["timeStamp"])
                if not (self._in_bounds("blockNumber", block) and self._in_bounds("timeStamp", ts)):
                    continue
                rows.append(
                    (
                        wallet, tx["hash"], block, ts, tx["from"], tx["to"],
                        tx["contractAddress"], tx["tokenName"], tx["tokenSymbol"],
                        tx["tokenDecimal"], tx["value"],
                    )
                )
            if rows:
                cols = list(zip(*rows))
                yield pa.RecordBatch.from_arrays(
                    [pa.array(c, type=f.type) for c, f in zip(cols, arrow_schema)],
                    schema=arrow_schema,
                )


class WalletTransfersDataSource(DataSource):
    """``spark.read.format("wallet_transfers").option("path", root)``
    after ``spark.dataSource.register(WalletTransfersDataSource)``."""

    @classmethod
    def name(cls):
        return "wallet_transfers"

    def schema(self):
        return SCHEMA_DDL

    def reader(self, schema):
        return WalletTransfersReader(self.options)

    def streamReader(self, schema):
        # R1s: the same source, readStream-able (continuous ingestion)
        return WalletTransfersStreamReader(self.options)


def write_wallet_pages(df, root: str, page_size: int = 500) -> int:
    """Materialize a raw-tokentx frame (``wallet_address`` + the wire
    fields, all strings) as the paginated per-wallet JSON dump the
    source reads — the stand-in for the external API. Pages are
    ascending by block (R3 ``sort=asc``) and carry their block range in
    the header for page skipping. Returns the page count. This is a
    FIXTURE builder (it simulates the remote system), so a driver-side
    pandas conversion is fine here and only here."""
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    pdf = df.toPandas()
    pdf["_block"] = pdf["blockNumber"].astype("int64")
    n_pages = 0
    for wallet, grp in pdf.groupby("wallet_address"):
        grp = grp.sort_values(["_block", "hash"])
        wdir = os.path.join(root, str(wallet))
        os.makedirs(wdir)
        for i in range(0, len(grp), page_size):
            chunk = grp.iloc[i : i + page_size]
            page = {
                "status": "1",
                "wallet": str(wallet),
                "startblock": int(chunk["_block"].min()),
                "endblock": int(chunk["_block"].max()),
                "result": [
                    {k: str(row[k]) for k in _WIRE} for _, row in chunk.iterrows()
                ],
            }
            with open(os.path.join(wdir, f"page-{i // page_size:04d}.json"), "w") as f:
                json.dump(page, f)
            n_pages += 1
    return n_pages


# ---------------------------------------------------------------------------
# R1s — the same paginated source as a STREAMING Python DataSource
# (Spark 4 DataSourceStreamReader): the reference's weekly batch pull
# becomes CONTINUOUS ingestion. The offset is {wallet: pages_consumed};
# each micro-batch plans one InputPartition per wallet that grew, so
# new pages land exactly once (offsets live in the checkpoint) and a
# 1000-executor cluster still pulls wallets in parallel per batch.
# ---------------------------------------------------------------------------


class _WalletPageRange(InputPartition):
    def __init__(self, wallet_dir: str, start: int, end: int):
        self.wallet_dir = wallet_dir
        self.start = start
        self.end = end


def _page_rows(page: dict, wallet_fallback: str):
    wallet = page.get("wallet", wallet_fallback)
    for tx in page.get("result", ()):
        yield (
            wallet, tx["hash"], int(tx["blockNumber"]), int(tx["timeStamp"]),
            tx["from"], tx["to"], tx["contractAddress"], tx["tokenName"],
            tx["tokenSymbol"], tx["tokenDecimal"], tx["value"],
        )


try:
    from pyspark.sql.datasource import DataSourceStreamReader

    class WalletTransfersStreamReader(DataSourceStreamReader):
        """Micro-batch reader over the per-wallet page dump.

        - ``latestOffset`` lists each wallet's current page count (a
          directory listing — metadata, no data read on the driver);
        - ``partitions(start, end)`` plans one partition per wallet
          whose count advanced, carrying its [start, end) page range;
        - ``read`` streams exactly those pages; an R4 error page
          (status != '1') yields nothing but still advances — the
          scan resumes only when the API recovers with later pages.
        """

        def __init__(self, options):
            self.root = options.get("path")
            if not self.root:
                raise ValueError("wallet_transfers stream requires .option('path', root)")

        def initialOffset(self):
            return {"pages": {}}

        def latestOffset(self):
            counts = {}
            for d in sorted(glob.glob(os.path.join(self.root, "*"))):
                if os.path.isdir(d):
                    counts[os.path.basename(d)] = len(
                        glob.glob(os.path.join(d, "page-*.json"))
                    )
            return {"pages": counts}

        def partitions(self, start, end):
            s = (start or {}).get("pages", {})
            parts = []
            for wallet, n_end in (end or {}).get("pages", {}).items():
                n_start = int(s.get(wallet, 0))
                if n_end > n_start:
                    parts.append(
                        _WalletPageRange(
                            os.path.join(self.root, wallet), n_start, int(n_end)
                        )
                    )
            return parts

        def read(self, partition):
            files = _page_files(partition.wallet_dir)
            wallet = os.path.basename(partition.wallet_dir)
            for f in files[partition.start : partition.end]:
                with open(f) as fh:
                    page = json.load(fh)
                if page.get("status") != "1":
                    continue  # R4: error page contributes no rows
                yield from _page_rows(page, wallet)

        def commit(self, end):
            pass

    _HAVE_STREAM_READER = True
except ImportError:  # pragma: no cover - older pyspark
    _HAVE_STREAM_READER = False


def append_wallet_pages(df, root: str, page_size: int = 500) -> int:
    """FIXTURE builder for the streaming source: append a new batch of
    rows as ADDITIONAL pages per wallet, numbering after each wallet's
    existing pages (the ascending-block contract is the caller's —
    append later block ranges, as the upstream API does). Returns the
    number of pages appended; driver-side pandas is fine here (this
    simulates the remote system, not the engine)."""
    pdf = df.toPandas()
    pdf["_block"] = pdf["blockNumber"].astype("int64")
    n_pages = 0
    for wallet, grp in pdf.groupby("wallet_address"):
        grp = grp.sort_values(["_block", "hash"])
        wdir = os.path.join(root, str(wallet))
        os.makedirs(wdir, exist_ok=True)
        next_i = len(glob.glob(os.path.join(wdir, "page-*.json")))
        for i in range(0, len(grp), page_size):
            chunk = grp.iloc[i : i + page_size]
            page = {
                "status": "1",
                "wallet": str(wallet),
                "startblock": int(chunk["_block"].min()),
                "endblock": int(chunk["_block"].max()),
                "result": [
                    {k: str(row[k]) for k in _WIRE} for _, row in chunk.iterrows()
                ],
            }
            with open(
                os.path.join(wdir, f"page-{next_i + i // page_size:04d}.json"), "w"
            ) as f:
                json.dump(page, f)
            n_pages += 1
    return n_pages
