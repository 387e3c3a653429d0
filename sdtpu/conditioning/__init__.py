from .prompt_parser import parse_prompt_attention  # noqa: F401
