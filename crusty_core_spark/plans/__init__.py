# NOTE: intentionally no re-exports — executors unpickle chain-stage
# functions that import plans.schemas; importing engine here would create a
# circular import through operators.chain_stage.
