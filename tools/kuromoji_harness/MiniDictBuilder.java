// Package-access shim: TokenInfoDictionaryBuilder is package-private;
// this public wrapper lets the harness build a TokenInfoDictionary
// from IPADIC-format CSVs with the REFERENCE's own builder (compiled
// in a scratch dir only — nothing here ships in the library).
package org.apache.lucene.analysis.ja.util;

import java.nio.file.Path;

public final class MiniDictBuilder {
    private MiniDictBuilder() {}

    public static void build(Path inputDir, Path outputDir)
            throws Exception {
        new TokenInfoDictionaryBuilder(
                DictionaryBuilder.DictionaryFormat.IPADIC, "utf-8",
                false)
                .build(inputDir)
                .write(outputDir);
    }
}
