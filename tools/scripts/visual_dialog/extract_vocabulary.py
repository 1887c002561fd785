"""Visual Dialog vocabulary extractor (reference
tools/scripts/visual_dialog/extract_vocabulary.py): questions, answers
and dialog captions from the visdial release json."""

import json

from tools.scripts.extract_vocabulary import ExtractVocabulary


class ExtractVisdialVocabulary(ExtractVocabulary):
    def get_text(self):
        text = []
        for input_file in self.args.input_files:
            with open(input_file) as f:
                f_json = json.load(f)
                text += f_json["data"]["questions"]
                text += f_json["data"]["answers"]
                for dialog in f_json["data"]["dialogs"]:
                    text += [dialog["caption"]]
        return text


if __name__ == "__main__":
    ExtractVisdialVocabulary().extract()
