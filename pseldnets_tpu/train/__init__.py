"""Training runtime: torch-checkpoint conversion, optimizers/schedules, the
pjit data-parallel train/eval steps, and orbax checkpointing."""
