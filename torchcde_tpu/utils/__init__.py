from .misc import cheap_stack, validate_input_path, is_concrete
from .tuple_control import TupleControl
from .observability import trace, annotate, save_checkpoint, load_checkpoint
