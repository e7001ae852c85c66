"""VLM (LLaVA-1.5) stack: CLIP vision tower, projector, multimodal Llama,
conversation templates, VQA eval, and the LLaVA GPTQ driver.

Parity: reference ``vlm/`` tree (llava_arch.py, multimodal_encoder/,
multimodal_projector/, conversation.py, mm_utils.py, eval/model_vqa.py,
llava.py GPTQ driver).
"""

from .clip import CLIPVisionConfig, CLIPVisionModel, CLIPVisionTower
from .conversation import (Conversation, SeparatorStyle,
                           conv_templates, default_conversation)
from .driver import llava_sequential
from .eval_vqa import eval_vqa, generate_mm, merge_answer_chunks
from .gpt_review import (build_review_content, parse_score,
                         review_answers, summarize_reviews)
from .llava import (IMAGE_TOKEN_INDEX, LlavaConfig, LlavaForCausalLM,
                    convert_hf_llava, pack_llava_lm,
                    splice_image_features)
from .mm_utils import (expand_image_tokens, get_chunk, process_images,
                       split_list, tokenizer_image_token)
from .mmbench import eval_mmbench, load_mmbench_table, score_mmbench
from .textvqa import (EvalAIAnswerProcessor, STVQAAccuracyEvaluator,
                      STVQAANLSEvaluator, TextVQAAccuracyEvaluator,
                      eval_textvqa_files)
from .projector import VisionProjector

__all__ = [
    "CLIPVisionConfig", "CLIPVisionModel", "CLIPVisionTower",
    "Conversation", "SeparatorStyle", "conv_templates",
    "default_conversation", "llava_sequential", "eval_vqa",
    "generate_mm", "merge_answer_chunks", "IMAGE_TOKEN_INDEX",
    "LlavaConfig", "LlavaForCausalLM", "convert_hf_llava",
    "pack_llava_lm", "splice_image_features", "expand_image_tokens",
    "get_chunk", "process_images", "split_list",
    "tokenizer_image_token", "VisionProjector",
    "build_review_content", "parse_score", "review_answers",
    "summarize_reviews", "eval_mmbench", "load_mmbench_table",
    "score_mmbench", "EvalAIAnswerProcessor",
    "STVQAAccuracyEvaluator", "STVQAANLSEvaluator",
    "TextVQAAccuracyEvaluator", "eval_textvqa_files",
]
