from learning_to_adapt_tpu.physics.spec import (
    BOX, CAPSULE, EULER, FREE, HFIELD, HINGE, PLANE, RK4, SLIDE, SPHERE,
    ActuatorSpec, BodySpec, GeomSpec, HFieldSpec, JointSpec, ModelSpec,
    MutableModel, OptionSpec, PhysicsModel, compile_spec, default_mutable)
from learning_to_adapt_tpu.physics.engine import (
    ForwardData, PhysicsState, forward, step)
