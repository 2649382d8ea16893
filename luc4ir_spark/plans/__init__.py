"""Build orchestration: resumable checkpointed index builds, lineage."""
