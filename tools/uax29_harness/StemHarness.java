import java.io.*;
public class StemHarness {
  public static void main(String[] args) throws IOException {
    String lang = args[0];
    BufferedReader r = new BufferedReader(new InputStreamReader(System.in, "UTF-8"));
    PrintWriter w = new PrintWriter(new BufferedWriter(new OutputStreamWriter(System.out, "UTF-8")));
    Object st = null;
    NorwegianLightStemmer no = null;
    switch (lang) {
      case "de": st = new GermanLightStemmer(); break;
      case "fr": st = new FrenchLightStemmer(); break;
      case "es": st = new SpanishLightStemmer(); break;
      case "it": st = new ItalianLightStemmer(); break;
      case "pt": st = new PortugueseLightStemmer(); break;
      case "ru": st = new RussianLightStemmer(); break;
      case "sv": st = new SwedishLightStemmer(); break;
      case "fi": st = new FinnishLightStemmer(); break;
      case "hu": st = new HungarianLightStemmer(); break;
      case "no": no = new NorwegianLightStemmer(NorwegianLightStemmer.BOKMAAL); break;
    }
    String line;
    while ((line = r.readLine()) != null) {
      char[] buf = (line + "        ").toCharArray(); // slack: stemmers may write past? no, but safe
      int len = line.length();
      int out;
      if (no != null) out = no.stem(buf, len);
      else if (st instanceof GermanLightStemmer) out = ((GermanLightStemmer) st).stem(buf, len);
      else if (st instanceof FrenchLightStemmer) out = ((FrenchLightStemmer) st).stem(buf, len);
      else if (st instanceof SpanishLightStemmer) out = ((SpanishLightStemmer) st).stem(buf, len);
      else if (st instanceof ItalianLightStemmer) out = ((ItalianLightStemmer) st).stem(buf, len);
      else if (st instanceof PortugueseLightStemmer) out = ((PortugueseLightStemmer) st).stem(buf, len);
      else if (st instanceof RussianLightStemmer) out = ((RussianLightStemmer) st).stem(buf, len);
      else if (st instanceof SwedishLightStemmer) out = ((SwedishLightStemmer) st).stem(buf, len);
      else if (st instanceof FinnishLightStemmer) out = ((FinnishLightStemmer) st).stem(buf, len);
      else out = ((HungarianLightStemmer) st).stem(buf, len);
      w.println(line + "\t" + new String(buf, 0, out));
    }
    w.flush();
  }
}
