from datalake_polygonscan_spark.pipeline.wallet_ingest import (
    process_token_transfers,
    run_snapshot_refresh,
    wallet_summary,
)

__all__ = ["process_token_transfers", "run_snapshot_refresh", "wallet_summary"]
