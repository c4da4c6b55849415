"""Prompt templates for the annotation pipeline.

Functionally parallel to the reference's nine templates
(reference prompts.py:5-103) — same slots, same intent, own wording
(templates are rewritten, not copied). Each is a plain ``str.format``
template; in Spark they are applied as ``format_string`` column
expressions or inside mapInPandas batches.
"""

CONTEXTUALIZATION = (
    "Summarize in one sentence what the following document excerpt is "
    "about.\nTitle: {title}\nExcerpt:\n{text}\nSummary:"
)

ANNOTATION = (
    "Context: {context}\n"
    "Extract every atomic, self-contained factual statement from the "
    "passage below. Output one fact per line as a dash bullet.\n"
    "Passage:\n{chunk}\nFacts:"
)

REFORMULATION = (
    "Rewrite the statement below so it stands alone without the "
    "surrounding context.\nContext: {context}\nStatement: {fact}\n"
    "Rewritten:"
)

CONFRONTATION = (
    "Do these two statements express the same fact?\n"
    "A: {fact_a}\nB: {fact_b}\nAnswer Yes or No:"
)

ENTITY_EXTRACTION = (
    "List the named entities (people, places, organizations, concepts) "
    "mentioned in this fact, one per line as a dash bullet.\n"
    "Fact: {fact}\nEntities:"
)

ENTITY_EQUIVALENCE = (
    "Do these two names refer to the same entity?\n"
    "A: {entity_a}\nB: {entity_b}\nAnswer Yes or No:"
)

QUESTION = "Answer the question using only the facts provided.\nFacts:\n{facts}\nQuestion: {question}\nAnswer:"

RETRIEVAL = (
    "Using the retrieved facts below, answer the user query.\n"
    "Facts:\n{facts}\nQuery: {query}\nAnswer:"
)
