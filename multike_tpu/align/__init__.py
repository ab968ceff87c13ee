from multike_tpu.align.predicates import PredicateAlignModel  # noqa: F401
