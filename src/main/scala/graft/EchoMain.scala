package graft
object EchoMain { def main(a: Array[String]): Unit = println("""{"probe":1}""") }
