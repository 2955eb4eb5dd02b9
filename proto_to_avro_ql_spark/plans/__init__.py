from proto_to_avro_ql_spark.plans.compile import (
    Constant,
    Scalar,
    SynthStruct,
    compile_projection,
    reference_ordering,
)

__all__ = ["Constant", "Scalar", "SynthStruct", "compile_projection", "reference_ordering"]
