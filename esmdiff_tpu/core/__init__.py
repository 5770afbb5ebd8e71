from . import constants, protein, residue_constants, tokenizer  # noqa: F401
