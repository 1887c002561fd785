"""GQA vocabulary extractor (reference
tools/scripts/gqa/extract_vocabulary.py): questions from VQA-style
question json files -> one word per line vocabulary."""

from tools.scripts.extract_vocabulary import ExtractVocabulary

if __name__ == "__main__":
    ExtractVocabulary().extract()
