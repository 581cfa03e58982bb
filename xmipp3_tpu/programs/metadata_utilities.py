"""xmipp_metadata_utilities — metadata algebra CLI.

Contract: reference metadata_utilities program (set operations, fill, query,
file operations on STAR tables; SURVEY.md §2.3 'metadata CLI algebra').
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.errors import ErrCode, XmippError
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.program import XmippProgram


class ProgMetadataUtilities(XmippProgram):
    name = "xmipp_metadata_utilities"

    def defineParams(self):
        self.addUsageLine("Perform operations on metadata files.")
        self.addParamsLine(" -i <metadata>         : Input metadata")
        self.addParamsLine("[-o <metadata=\"\">]     : Output metadata (default: in-place)")
        self.addParamsLine("[--set <set_operation>] : Set operation with another metadata")
        self.addParamsLine("    where <set_operation>")
        self.addParamsLine("       union <md2>        : Union of both")
        self.addParamsLine("       union_all <md2>    : Union keeping duplicates")
        self.addParamsLine("       intersection <md2> <label=itemId> : Rows present in both")
        self.addParamsLine("       subtraction <md2> <label=itemId>  : Rows not in md2")
        self.addParamsLine("       join <md2> <label=itemId>         : Natural join on label")
        self.addParamsLine("       merge <md2>        : Merge columns side by side")
        self.addParamsLine("[--operate <operation>] : Row/column operation")
        self.addParamsLine("    where <operation>")
        self.addParamsLine("       sort <label=itemId> : Sort by label")
        self.addParamsLine("       random_subset <n>   : Random n rows")
        self.addParamsLine("       percentile <col> <col2> : Percentile rank of column")
        self.addParamsLine("       keep_column <cols>  : Keep only these columns")
        self.addParamsLine("       drop_column <cols>  : Remove these columns")
        self.addParamsLine("       rename_column <old_new> : Rename columns")
        self.addParamsLine("       modify_values <expression> : pandas expression, e.g. \"anglePsi=0\"")
        self.addParamsLine("[--query <query_operation>] : Query")
        self.addParamsLine("    where <query_operation>")
        self.addParamsLine("       select <expression> : Keep rows matching pandas query")
        self.addParamsLine("       count <label>       : Count distinct values")
        self.addParamsLine("       size                : Print number of rows")
        self.addParamsLine("[--fill <labels_fill>] : Fill a column")
        self.addParamsLine("    where <labels_fill>")
        self.addParamsLine("       constant <label> <value> : Constant value")
        self.addParamsLine("       lineal <label> <init> <step> : Linear ramp")
        self.addParamsLine("       rand_uniform <label> <a=0> <b=1> : Uniform random")
        self.addParamsLine("       rand_gaussian <label> <mean=0> <stddev=1> : Gaussian random")
        self.addParamsLine("[--mode <mode=overwrite>] : overwrite | append")

    def run(self):
        fn_in = self.getParam("-i")
        fn_out = self.getParam("-o") if self.checkParam("-o") else fn_in
        md = MetaData(fn_in)
        wrote = False

        if self.checkParam("--set"):
            toks = self.getListParam("--set")
            op, fn2 = toks[0], toks[1]
            md2 = MetaData(fn2)
            label = toks[2] if len(toks) > 2 else "itemId"
            if op in ("union", "union_all"):
                md.unionAll(md2)
                if op == "union":
                    md._df = md._df.drop_duplicates().reset_index(drop=True)
            elif op == "intersection":
                keep = md.df[label].isin(set(md2.df[label]))
                md._df = md.df[keep].reset_index(drop=True)
            elif op == "subtraction":
                keep = ~md.df[label].isin(set(md2.df[label]))
                md._df = md.df[keep].reset_index(drop=True)
            elif op == "join":
                md._df = md.df.merge(md2.df, on=label, how="inner",
                                     suffixes=("", "_2"))
            elif op == "merge":
                md._df = md.df.join(md2.df, rsuffix="_2")
            else:
                raise XmippError(ErrCode.ARG_INCORRECT, f"--set {op}")

        if self.checkParam("--operate"):
            toks = self.getListParam("--operate")
            op = toks[0]
            if op == "sort":
                md.sort(toks[1] if len(toks) > 1 else "itemId")
            elif op == "random_subset":
                n = int(toks[1])
                idx = np.random.default_rng(0).permutation(len(md))[:n]
                md._df = md.df.iloc[np.sort(idx)].reset_index(drop=True)
            elif op == "keep_column":
                cols = toks[1].replace(",", " ").split()
                md._df = md.df[cols]
            elif op == "drop_column":
                cols = toks[1].replace(",", " ").split()
                md._df = md.df.drop(columns=[c for c in cols if c in md.df])
            elif op == "rename_column":
                pair = toks[1].replace(",", " ").split()
                md.renameColumn(pair[0], pair[1])
            elif op == "modify_values":
                expr = " ".join(toks[1:])
                md._df = md.df.eval(expr)
            else:
                raise XmippError(ErrCode.ARG_INCORRECT, f"--operate {op}")

        if self.checkParam("--fill"):
            toks = self.getListParam("--fill")
            op, label = toks[0], toks[1]
            if op == "constant":
                md.fillConstant(label, _parse(toks[2]))
            elif op == "lineal":
                md.fillLinear(label, float(toks[2]), float(toks[3]))
            elif op == "rand_uniform":
                a = float(toks[2]) if len(toks) > 2 else 0.0
                b = float(toks[3]) if len(toks) > 3 else 1.0
                md.setColumnValues(label, np.random.default_rng(0).uniform(
                    a, b, len(md)))
            elif op == "rand_gaussian":
                m = float(toks[2]) if len(toks) > 2 else 0.0
                s = float(toks[3]) if len(toks) > 3 else 1.0
                md.setColumnValues(label, np.random.default_rng(0).normal(
                    m, s, len(md)))
            else:
                raise XmippError(ErrCode.ARG_INCORRECT, f"--fill {op}")

        if self.checkParam("--query"):
            toks = self.getListParam("--query")
            op = toks[0]
            if op == "select":
                md = md.select(" ".join(toks[1:]))
            elif op == "count":
                label = toks[1]
                counts = md.df[label].value_counts()
                md = MetaData.fromRows(
                    [{label: k, "count": int(v)} for k, v in counts.items()])
            elif op == "size":
                print(f"size: {md.size()}")
                wrote = True  # size only prints
            else:
                raise XmippError(ErrCode.ARG_INCORRECT, f"--query {op}")

        if not wrote or fn_out != fn_in:
            md.write(fn_out, append=self.checkParam("--mode") and
                     self.getParam("--mode") == "append")
        self.md_result = md


def _parse(tok: str):
    try:
        return int(tok)
    except ValueError:
        try:
            return float(tok)
        except ValueError:
            return tok


PROGRAM = ProgMetadataUtilities
