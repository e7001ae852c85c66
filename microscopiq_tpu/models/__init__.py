"""Model zoo: Llama family (llama/mistral/mixtral), OPT, LLaVA."""

from .llama import (  # noqa: F401
    LlamaConfig,
    LlamaForCausalLM,
    LlamaModel,
    QLinear,
    causal_mask,
)
from .loading import (  # noqa: F401
    convert_llama,
    convert_mpt,
    convert_opt,
    load_hf_state_dict,
    state_dict_from_torch_model,
)
from .opt import OPTConfig, OPTForCausalLM  # noqa: F401
