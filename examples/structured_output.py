"""Structured-output walkthrough: regex, EBNF, and (recursive) JSON
schema constraints through the in-process LLM — the xgrammar-style
surface of the reference (`engine_core.md:307-310`), CPU-runnable with
the byte tokenizer and a random tiny model.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
         python examples/structured_output.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vllm_omni_draft_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SchedulerConfig,
)
from vllm_omni_draft_tpu.core.grammar import (
    EbnfGrammar,
    JsonSchemaGrammar,
    RegexGrammar,
)
from vllm_omni_draft_tpu.core.request import SamplingParams
from vllm_omni_draft_tpu.core.tokenizer import ByteTokenizer
from vllm_omni_draft_tpu.engine.llm import LLM


def main():
    cfg = EngineConfig(
        model=ModelConfig.tiny(
            vocab_size=258, hidden_size=64, intermediate_size=128,
            num_heads=4, num_kv_heads=2, head_dim=16, max_model_len=512,
        ),
        cache=CacheConfig(block_size=16, num_blocks=128),
        scheduler=SchedulerConfig(
            max_num_seqs=4, max_num_batched_tokens=256,
            prefill_buckets=(32,), max_model_len=512,
        ),
        seed=0,
    )
    llm = LLM(cfg)
    tok = ByteTokenizer()

    # 1. regex: an ISO-ish date
    g = RegexGrammar(r"20[0-9]{2}-[01][0-9]-[0-3][0-9]", tok)
    sp = SamplingParams(max_tokens=16, temperature=1.0, grammar=g,
                        ignore_eos=True, seed=1)
    out = llm.generate(["date:"], [sp])[0]
    print("regex        :", out.outputs[0].text)

    # 2. EBNF (GBNF dialect), recursive -> pushdown backend
    g = EbnfGrammar(
        'root ::= "v" num | "(" root ("+" root)* ")"\n'
        'num ::= [0-9]{1,2}',
        tok,
    )
    sp = SamplingParams(max_tokens=40, temperature=1.0, grammar=g,
                        ignore_eos=True, seed=7)
    out = llm.generate(["expr:"], [sp])[0]
    print("ebnf (CFG)   :", out.outputs[0].text)

    # 3. recursive JSON schema (unbounded nesting via $ref)
    schema = {
        "$defs": {
            "node": {
                "type": "object",
                "properties": {
                    "op": {"enum": ["add", "mul"]},
                    "args": {
                        "type": "array",
                        "items": {"$ref": "#/$defs/node"},
                        "maxItems": 2,
                    },
                    "v": {"type": "integer"},
                },
                "required": ["op"],
                "additionalProperties": False,
            }
        },
        "$ref": "#/$defs/node",
    }
    g = JsonSchemaGrammar(schema, tok)
    sp = SamplingParams(max_tokens=96, temperature=1.0, grammar=g,
                        ignore_eos=True, seed=3)
    out = llm.generate(["tree:"], [sp])[0]
    doc = json.loads(out.outputs[0].text)  # must parse
    print("json schema  :", json.dumps(doc))


if __name__ == "__main__":
    main()
