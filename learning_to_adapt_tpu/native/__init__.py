from learning_to_adapt_tpu.native.oracle import (  # noqa: F401
    NativePhysics, available, load_library)
