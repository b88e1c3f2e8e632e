from .misc import cheap_stack, validate_input_path, is_concrete
from .tuple_control import TupleControl
